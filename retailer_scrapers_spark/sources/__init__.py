"""Sources: the deterministic synthetic web + vectorized fetch/parse.

No network exists in (or is needed by) this engine's tests: the "web"
is a generated ``site_pages`` table (FIXTURES.md §3) whose payload
shapes mirror the reference's four retailer sites, and fetch is a pure
lookup (join) against it. On a real deployment the fetch stage swaps
to an HTTP client inside the same ``mapInArrow`` contract.
"""
