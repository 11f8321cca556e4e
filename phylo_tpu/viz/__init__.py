from phylo_tpu.viz.trees import (  # noqa: F401
    decode_genealogy,
    merge_name_chains,
    to_newick,
    tree_probabilities,
)
