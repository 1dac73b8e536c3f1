"""Pure-numpy reference kernels — the single home of spatial semantics.

Everything here is vectorized numpy over int64/float64 arrays, no Spark
imports, so the same code backs (a) unit-test oracles and (b) pandas UDFs.
"""
