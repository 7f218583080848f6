from .reshape import jolt_reshape, reference_bench_spec  # noqa: F401
from .window_features import backfill, with_turn_features  # noqa: F401
from .asof import asof_join, asof_join_pandas  # noqa: F401
