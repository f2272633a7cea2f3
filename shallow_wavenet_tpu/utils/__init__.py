"""Shared utilities: native-library bindings, profiling helpers."""
