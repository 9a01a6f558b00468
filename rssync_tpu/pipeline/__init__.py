"""JSON-recipe pipeline driver (ref: src/core_testcode.cpp:235-319)."""

from rssync_tpu.pipeline.recipe import run_recipe

__all__ = ["run_recipe"]
