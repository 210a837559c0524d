# Submodules are imported lazily by consumers to avoid import cycles with
# gbrl_tpu.optimizers (which depends on ops.predict).
