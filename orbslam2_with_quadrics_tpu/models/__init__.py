"""SLAM pipelines assembled from ops kernels (frontend, tracking, mapping,
loop closing, the System facade, and the struct-of-arrays map state)."""
