"""Sources: deterministic in-job fixture generators + testdata loaders."""
