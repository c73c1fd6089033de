"""Pipeline assemblies: calibrator, tracker, per-frame mocap step."""
