import os

import numpy as np

from phylo_tpu.viz.plots import build_digraph, draw_tree
from tests.test_trees import TAXA, _records


def test_build_digraph_structure():
    from phylo_tpu.viz.trees import decode_genealogy

    ancestors, merged = _records()
    gen = decode_genealogy(ancestors, merged)
    g = build_digraph(TAXA, gen[0])
    # 4 leaves + 3 internal = 7 nodes, 6 edges
    assert g.number_of_nodes() == 7
    assert g.number_of_edges() == 6
    roots = [n for n in g.nodes if g.in_degree(n) == 0]
    assert roots == ["hu+ch+go+or"]


def test_draw_tree_writes_png(tmp_path):
    from phylo_tpu.viz.trees import decode_genealogy

    ancestors, merged = _records()
    gen = decode_genealogy(ancestors, merged)
    path = os.path.join(tmp_path, "tree.png")
    draw_tree(TAXA, gen[1], prob=0.5, path=path)
    assert os.path.getsize(path) > 0
