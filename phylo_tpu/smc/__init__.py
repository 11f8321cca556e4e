from phylo_tpu.smc.sweep import (  # noqa: F401
    SweepConfig,
    SweepResult,
    sample_phylogenies,
    compute_log_zsmc,
)
from phylo_tpu.smc.resampling import resample_indices  # noqa: F401
from phylo_tpu.smc.bootstrap import (  # noqa: F401
    BootstrapResult,
    bootstrap_supports,
)
