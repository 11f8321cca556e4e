from phylo_tpu.models.expm import (  # noqa: F401
    expm_ctmc,
    jc69_transition,
)
from phylo_tpu.models.substitution import (  # noqa: F401
    JC69,
    ReferenceQ,
    GTR,
    HKY,
    GammaSites,
    FreeRates,
    get_model,
)
from phylo_tpu.models.empirical import (  # noqa: F401
    EmpiricalProtein,
    load_paml_dat,
)
from phylo_tpu.models.selection import (  # noqa: F401
    DNA_CANDIDATES,
    ModelFit,
    n_free_parameters,
    select_model,
)
from phylo_tpu.models.branches import (  # noqa: F401
    init_branch_params,
    branch_rates,
    sample_branches,
    exponential_logpdf,
)
