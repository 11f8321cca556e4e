from phylo_tpu.dataio.alphabets import (  # noqa: F401
    DNA_ALPHABET,
    DNA_AMBIGUITY,
    PROTEIN_ALPHABET,
    encode_strings,
    one_hot_rows,
)
from phylo_tpu.dataio.datasets import (  # noqa: F401
    PhyloDataset,
    detect_alphabet,
    load_dataset,
    dataset_from_arrays,
    dataset_from_strings,
    simulate_dna,
    list_datasets,
)
from phylo_tpu.dataio.simulate import (  # noqa: F401
    simulate_on_tree,
)
