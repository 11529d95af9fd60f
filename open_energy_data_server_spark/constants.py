"""Engine-wide constants."""

# Fixed-point scale (6 decimal digits) for order-independent exact
# float aggregation — shared by the query helpers (queries._util) and
# the operators that must replay identically in the DuckDB oracle.
SCALE = 1_000_000
