from eao_slam_tpu.geometry import so3, se3, sim3, camera, triangulate  # noqa: F401
