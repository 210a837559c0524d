"""Native host-side components.

The TPU compute path is pure JAX/XLA; host-side native code lives in
``gbrl_tpu.utils.c_runtime`` (ensemble compiled to a .so for
dependency-free serving) and ``gbrl_tpu.utils.c_export`` (the C-header
generator it builds on).
"""
