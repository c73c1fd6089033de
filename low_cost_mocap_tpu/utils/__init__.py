"""Utilities: synthetic rigs, calibration artifacts, profiling."""
