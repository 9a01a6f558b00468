"""Framework-provided evaluation utilities: synthetic rolling-shutter
scene/video generation with ground-truth delay (the reference has no
automated tests — SURVEY §4 — so this layer is the rebuild's fixture
factory for tests and benchmarks)."""
