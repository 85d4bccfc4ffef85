"""Query parsing, compiled-query expression trees, and physical planning."""
