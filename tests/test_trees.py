import numpy as np

from phylo_tpu.viz.trees import (
    decode_genealogy,
    majority_consensus,
    merge_name_chains,
    to_newick,
    tree_probabilities,
)

TAXA = ["hu", "ch", "go", "or"]
# N=4, R=3, K=2.  Node ids: leaves 0-3, internal 4,5,6.


def _records():
    # rank 0: particle0 merges (0,1)->4 ; particle1 merges (2,3)->4
    # rank 1: ancestors [1,1] (both copy particle1); both merge (0,1)->5
    # rank 2: ancestors [0,1]; merge (5,4)->6 for k0, (4,5)->6 for k1
    ancestors = np.array([[0, 1], [1, 1], [0, 1]])
    merged = np.array(
        [
            [[0, 1], [2, 3]],
            [[0, 1], [0, 1]],
            [[5, 4], [4, 5]],
        ]
    )
    return ancestors, merged


def test_decode_lineage_follows_ancestry():
    ancestors, merged = _records()
    gen = decode_genealogy(ancestors, merged)
    # final particle 0: lineage rank2=0, rank1=ancestors[2][0]=0? no --
    # lineage[r-1] = ancestors[r][lineage[r]]:
    # lineage[2]=0, lineage[1]=ancestors[2][0]=0, lineage[0]=ancestors[1][0]=1
    np.testing.assert_array_equal(gen[0]["lineage"], [1, 0, 0])
    # so its rank-0 merge is particle1's: (2,3)
    np.testing.assert_array_equal(gen[0]["merges"][0], [2, 3])


def test_merge_names_and_newick():
    ancestors, merged = _records()
    gen = decode_genealogy(ancestors, merged)
    chains = merge_name_chains(TAXA, gen)
    # particle 0: node4 = go+or (from ancestor particle 1), node5 = hu+ch,
    # node6 = (hu+ch)+(go+or)
    assert chains[0] == ["go+or", "hu+ch", "hu+ch+go+or"]
    nwk = to_newick(TAXA, gen[0])
    assert nwk == "((hu,ch),(go,or));"


def test_newick_with_branch_lengths():
    ancestors, merged = _records()
    lb = np.full((3, 2), 0.5)
    rb = np.full((3, 2), 0.25)
    gen = decode_genealogy(ancestors, merged, lb, rb)
    nwk = to_newick(TAXA, gen[1])
    assert ":0.5" in nwk and ":0.25" in nwk


def test_tree_probabilities_group_identical_topologies():
    ancestors, merged = _records()
    gen = decode_genealogy(ancestors, merged)
    # both particles end with topology ((hu,ch),(go,or)) -- same clades
    probs = tree_probabilities(TAXA, gen, np.array([0.0, 0.0]))
    assert len(probs) == 1
    np.testing.assert_allclose(probs[0][0], 1.0)


def test_majority_consensus_hand_built():
    taxa = ["a", "b", "c", "d"]
    # ((a,b),(c,d)) twice, ((a,c),(b,d)) once, equal weights
    r_ab = {"merges": np.array([[0, 1], [2, 3], [4, 5]])}
    r_ac = {"merges": np.array([[0, 2], [1, 3], [4, 5]])}
    nwk, sup = majority_consensus(taxa, [r_ab, r_ab, r_ac])
    np.testing.assert_allclose(sup[frozenset({"a", "b"})], 2 / 3)
    np.testing.assert_allclose(sup[frozenset({"c", "d"})], 2 / 3)
    assert frozenset({"a", "c"}) not in sup
    assert nwk == "((a,b)0.667,(c,d)0.667);"

    # unanimous particles -> the topology itself, support 1
    nwk1, sup1 = majority_consensus(taxa, [r_ab, r_ab])
    assert nwk1 == "((a,b)1.000,(c,d)1.000);"
    assert all(abs(s - 1.0) < 1e-12 for s in sup1.values())

    # three-way conflict -> no clade above 1/2: star tree
    r_ad = {"merges": np.array([[0, 3], [1, 2], [4, 5]])}
    nwk2, sup2 = majority_consensus(taxa, [r_ab, r_ac, r_ad])
    assert nwk2 == "(a,b,c,d);"
    assert sup2 == {}

    # weights decide: put nearly all mass on ((a,c),(b,d))
    log_w = np.log(np.array([0.05, 0.05, 0.9]))
    nwk3, sup3 = majority_consensus(taxa, [r_ab, r_ab, r_ac], log_w)
    assert frozenset({"a", "c"}) in sup3
    assert frozenset({"a", "b"}) not in sup3
    assert nwk3 == "((a,c)0.900,(b,d)0.900);"


def test_majority_consensus_nested_clades():
    taxa = ["a", "b", "c", "d", "e"]
    # caterpillar (((a,b),c),d),e  -- all particles identical
    rec = {"merges": np.array([[0, 1], [5, 2], [6, 3], [7, 4]])}
    nwk, sup = majority_consensus(taxa, [rec, rec, rec])
    assert nwk == "((((a,b)1.000,c)1.000,d)1.000,e);"
    assert len(sup) == 3


def test_robinson_foulds():
    from phylo_tpu.viz.trees import robinson_foulds

    taxa = ["a", "b", "c", "d", "e"]
    cat = {"merges": np.array([[0, 1], [5, 2], [6, 3], [7, 4]])}
    # swap c and d deep in the caterpillar: clades {a,b,c} vs {a,b,d}
    cat2 = {"merges": np.array([[0, 1], [5, 3], [6, 2], [7, 4]])}
    bal = {"merges": np.array([[0, 1], [2, 3], [5, 6], [7, 4]])}
    assert robinson_foulds(taxa, cat, cat) == 0
    assert robinson_foulds(taxa, cat, cat2) == 2
    assert robinson_foulds(taxa, cat, bal) == robinson_foulds(
        taxa, bal, cat
    )
    # caterpillar vs balanced share {a,b} and {a,b,c,d}; unique clades
    # are {a,b,c} (caterpillar) and {c,d} (balanced)
    assert robinson_foulds(taxa, cat, bal) == 2
    assert robinson_foulds(taxa, cat, bal, normalized=True) == 2 / 6


def test_sweep_recovers_simulated_topology():
    """End-to-end topology recovery: simulate data on a known tree,
    run the sweep under the true model, and check the best particle's
    RF distance to the truth (deterministic given the fixed seed)."""
    import jax
    import jax.numpy as jnp

    from phylo_tpu.dataio.simulate import simulate_on_tree
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import JC69
    from phylo_tpu.pruning.fixed_tree import parse_newick
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
    from phylo_tpu.viz.trees import robinson_foulds

    model = JC69(A=4)
    params0 = {"model": model.init_params(jnp.float64)}
    _, truth = parse_newick(
        "(((A:0.08,B:0.1):0.12,C:0.25):0.1,(D:0.09,E:0.11):0.2);"
    )
    ds = simulate_on_tree(truth, model, params0, S=400, seed=5)
    params = {"model": model.init_params(jnp.float64),
              "branches": init_branch_params(ds.N, dtype=jnp.float64)}
    res = sample_phylogenies(
        jax.random.PRNGKey(8), jnp.asarray(ds.genome), model, params,
        SweepConfig(K=64),
    )
    gen = decode_genealogy(np.asarray(res.ancestors),
                           np.asarray(res.merged_nodes))
    best = int(np.argmax(np.asarray(res.log_likelihood_R)))
    d = robinson_foulds(ds.taxa, gen[best], truth)
    assert d <= 2, d


def test_jump_chain_evolution_hand_traced():
    from phylo_tpu.viz.trees import jump_chain_evolution

    ancestors, merged = _records()
    chains = jump_chain_evolution(TAXA, ancestors, merged)
    assert len(chains) == 2
    # rank-0 snapshot: initial taxa; rank-1: slot content after copying
    # particle 1 (which merged go+or); rank-2: post (0,1)->5 merge;
    # final: completed root (k0 merged (5,4), k1 merged (4,5))
    assert chains[0] == [
        ["hu", "ch", "go", "or"],
        ["hu", "ch", "go+or"],
        ["go+or", "hu+ch"],
        ["hu+ch+go+or"],
    ]
    assert chains[1] == [
        ["hu", "ch", "go", "or"],
        ["hu", "ch", "go+or"],
        ["go+or", "hu+ch"],
        ["go+or+hu+ch"],
    ]


def test_to_nexus_format():
    from phylo_tpu.viz.trees import decode_genealogy, to_nexus

    ancestors, merged = _records()
    gen = decode_genealogy(ancestors, merged)
    out = to_nexus(TAXA, gen, probs=[0.7, 0.3])
    assert out.startswith("#NEXUS")
    assert "TRANSLATE" in out and out.rstrip().endswith("END;")
    assert "        1 hu," in out and "        4 or;" in out
    assert "TREE tree_1 [&W 0.7] = [&U] " in out
    # trees reference translate indices, not names
    tree_lines = [x for x in out.splitlines() if x.startswith("    TREE")]
    assert len(tree_lines) == 2
    assert "hu" not in tree_lines[0]


def test_trees_cli_summarizes_posterior(tmp_path):
    import json

    from phylo_tpu.cli import runner as run_cli
    from phylo_tpu.cli.trees import main as trees_main

    res = run_cli.main([
        "--dataset=load_strings", "--n_particles=8", "--num_epoch=2",
        "--batch_size=5", f"--results_dir={tmp_path}",
    ])
    summary = trees_main([res.save_dir, "--top", "3"])
    assert summary["topologies"]
    total = sum(t["probability"] for t in summary["topologies"])
    assert 0 < total <= 1 + 1e-9
    assert summary["topologies"][0]["newick"].endswith(";")
    import os

    assert os.path.exists(summary["nexus"])
    json.dumps(summary)   # JSON-serializable
