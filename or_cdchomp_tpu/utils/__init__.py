"""Host-side utilities: pose math, shell parsing, timing, logging."""
