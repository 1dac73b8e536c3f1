"""Column-level function builders — JVM-side expressions first (UDFs are the
slow path; everything here compiles to Catalyst expressions inside
whole-stage codegen unless explicitly noted)."""
