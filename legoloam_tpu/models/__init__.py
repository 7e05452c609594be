"""Pipeline stages: odometry, mapping, pose graph, fusion, full pipeline."""
