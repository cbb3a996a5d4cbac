"""Ray Data batch UDFs and actor-pool stages (zero-copy Arrow in/out)."""
