"""SLAM runtime: keyframe reservoir, tracking/mapping megasteps, orchestrator."""
