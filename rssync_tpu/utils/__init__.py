"""Shared utilities: finite guards (the reference's panic layer), CSV IO."""
