"""Staged build plans: the reference's resumable stage machine on Spark."""
