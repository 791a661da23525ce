"""SLAM state machine layer: map, tracking, initializer, local mapping,
loop closing, relocalization."""
