from phylo_tpu.utils.math import (  # noqa: F401
    log_double_factorial_odd,
    topology_log_prior,
    n_choose_2,
)
