"""Column-expression libraries (kept JVM-side: every function here
returns a built-in-function composition, never a row-at-a-time Python
UDF, so plans stay inside whole-stage codegen)."""
