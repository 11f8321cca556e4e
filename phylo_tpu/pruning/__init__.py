from phylo_tpu.pruning.ancestral import (  # noqa: F401
    ancestral_marginals,
    collapse_categories,
    decode_states,
)
from phylo_tpu.pruning.felsenstein import (  # noqa: F401
    merge_messages,
    root_log_likelihood,
)
from phylo_tpu.pruning.fixed_tree import (  # noqa: F401
    optimize_branch_lengths,
    optimize_tree,
    parse_newick,
    tree_log_likelihood,
)
from phylo_tpu.pruning.posterior import (  # noqa: F401
    forest_log_prior,
    overcounting_correction,
)
