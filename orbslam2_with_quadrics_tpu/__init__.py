"""orbslam2_with_quadrics_tpu — a TPU-native visual SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yxqc/ORBSLAM2_with_quadrics (ORB-SLAM2 + dual-quadric object landmarks):

- ``ops``      — device compute kernels: Lie groups, camera models, ORB
                 feature pyramid (FAST/orientation/BRIEF), Hamming matching,
                 RANSAC solvers, Levenberg-Marquardt, Schur-complement bundle
                 adjustment, Sim3 pose graphs, dual quadrics, binary BoW.
- ``models``   — the SLAM pipelines built from those ops: frontend, tracking,
                 local mapping, loop closing, the System facade, and the
                 struct-of-arrays map state.
- ``parallel`` — multi-chip/multi-host sharding: mesh helpers, distributed
                 Schur BA over ``shard_map``, sharded loop retrieval.
- ``utils``    — configs (reference-compatible YAML keys), dataset loaders
                 (TUM/KITTI/synthetic), trajectory export, metrics.

Design stance (vs the C++/pthread reference): fixed-capacity padded
struct-of-arrays map state, pure jitted functions with ``vmap``/``lax`` control
flow, masking instead of deletion, and a thin host orchestrator instead of the
reference's four mutex-coupled threads (reference: src/System.cc:89-103).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (Lie ops, Jacobians, Schur solves) needs true f32 matmuls; the
# platform default silently downcasts matmul inputs to bf16, which breaks
# pose/BA convergence (observed: 1e-3 error in 3x3 products). Hot MXU
# kernels that genuinely want bf16 (descriptor matmuls, conv moments)
# request it explicitly via preferred_element_type / dtype casts.
_jax.config.update("jax_default_matmul_precision", "highest")
