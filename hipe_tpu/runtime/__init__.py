"""Runtime: heterogeneous executor, batch streaming, device lanes."""

from hipe_tpu.runtime.engine import Engine, EngineConfig  # noqa: F401
