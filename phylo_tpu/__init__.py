"""phylo-tpu: a TPU-native JAX framework for variational combinatorial SMC
phylogenetic inference.

Re-implements, TPU-first, the capabilities of the reference VCSMC codebase
(amoretti86/phylo: csmc.py / vcsmc.py / vncsmc.py): Felsenstein-pruning
partial likelihoods batched over particles x sites x states, JC69/learned-Q
substitution models with fused batched matrix exponentials, coalescent
pair-merge proposals, multinomial/systematic resampling, the log Z_SMC ELBO
trained with Optax, VNCSMC look-ahead twisting as a masked batched pair
enumeration, and site-axis sharding over a TPU mesh.

Nothing here is a port: the reference is TF1 graph code with growing/
shrinking loop state and string jump chains; this package uses static-shape
`lax.scan` sweeps, write-once node-message buffers with ancestry
indirection, incremental forest posteriors, and integer merge records that
are decoded to trees host-side.
"""

__version__ = "0.1.0"

from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies  # noqa: F401
from phylo_tpu.smc.twist import TwistConfig  # noqa: F401
from phylo_tpu.models.substitution import (  # noqa: F401
    GTR,
    HKY,
    JC69,
    FixedQ,
    FreeRates,
    GammaSites,
    ReferenceQ,
    get_model,
)
from phylo_tpu.models.empirical import (  # noqa: F401
    EmpiricalProtein,
    load_paml_dat,
)
from phylo_tpu.models.branches import init_branch_params  # noqa: F401
from phylo_tpu.dataio.datasets import (  # noqa: F401
    dataset_from_arrays,
    load_dataset,
)
from phylo_tpu.pruning.ancestral import ancestral_marginals  # noqa: F401
from phylo_tpu.models.selection import select_model  # noqa: F401
from phylo_tpu.pruning.fixed_tree import (  # noqa: F401
    optimize_branch_lengths,
    optimize_tree,
    parse_newick,
    tree_log_likelihood,
)
from phylo_tpu.search import neighbor_joining, nni_search  # noqa: F401
from phylo_tpu.search.nj import jc_distance_matrix  # noqa: F401
from phylo_tpu.smc.bootstrap import bootstrap_supports  # noqa: F401
from phylo_tpu.train.trainer import TrainConfig, train  # noqa: F401
