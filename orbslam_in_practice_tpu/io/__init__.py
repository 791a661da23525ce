"""Dataset loaders (TUM / KITTI / EuRoC formats), synthetic sequences,
trajectory export, and ATE evaluation (SURVEY.md §4, §5)."""
