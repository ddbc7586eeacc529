"""S2-style cell grid, broadcastable rectangle index, spatial joins."""
