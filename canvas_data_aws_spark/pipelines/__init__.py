"""Composed end-to-end pipelines built from the registered operators.

The reference is ONE composed artifact (sync-canvas-data-files.py runs the
whole sync choreography in a single invocation); these modules give the
query side the same identity — a curation run is one callable, not a parts
bin of registry entries."""
