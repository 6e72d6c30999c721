"""ov2slam_tpu — a TPU-native visual SLAM engine built from scratch in JAX.

Re-implements the capabilities of OV²SLAM (reference: chngdickson/ov2slam,
C++/ROS) as an idiomatic JAX/XLA/Pallas framework:

- ``ov2slam_tpu.utils``   — SE3 Lie algebra, config, profiler, trajectory I/O.
- ``ov2slam_tpu.core``    — camera models, image pyramid / preprocessing.
- ``ov2slam_tpu.ops``     — KLT tracking, corner detection, BRIEF, Hamming
  matching (XLA + Pallas kernels).
- ``ov2slam_tpu.geometry``— batched multi-view geometry (triangulation, P3P,
  essential-matrix RANSAC).
- ``ov2slam_tpu.solvers`` — Levenberg–Marquardt solvers: motion-only PnP,
  Schur-complement local/loose/full bundle adjustment, pose graph.
- ``ov2slam_tpu.mapping`` — fixed-capacity SoA map state (keyframes,
  landmarks, observations, covisibility, occupancy grid).
- ``ov2slam_tpu.models``  — the pipeline stages (front-end, mapper,
  estimator, loop closer) and the SLAM session manager.
- ``ov2slam_tpu.loopclosure`` — binary-descriptor place-recognition index.
- ``ov2slam_tpu.parallel``— device-mesh sharding and distributed BA.
- ``ov2slam_tpu.io``      — EuRoC/ASL readers, synthetic sequence generator.
"""

__version__ = "0.1.0"
