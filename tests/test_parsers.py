import textwrap
import zipfile

import pytest

from phylo_tpu.dataio.parsers import (
    load_alignment_file,
    parse_fasta,
    parse_nexus,
    parse_phylip,
)


def test_fasta_multiline():
    txt = ">a desc\nACGT\nACGT\n>b\nTTTT\nAAAA\n"
    seqs = parse_fasta(txt)
    assert seqs == {"a": "ACGTACGT", "b": "TTTTAAAA"}


def test_fasta_rejects_headerless():
    with pytest.raises(ValueError):
        parse_fasta("ACGT\n")


def test_phylip_sequential():
    txt = "2 8\ntaxon1 ACGTACGT\ntaxon2 TTTTAAAA\n"
    seqs = parse_phylip(txt)
    assert seqs == {"taxon1": "ACGTACGT", "taxon2": "TTTTAAAA"}


def test_phylip_interleaved():
    txt = "2 8\nt1 ACGT\nt2 TTTT\nACGT\nAAAA\n"
    seqs = parse_phylip(txt)
    assert seqs == {"t1": "ACGTACGT", "t2": "TTTTAAAA"}


def test_phylip_length_mismatch():
    with pytest.raises(ValueError, match="sites"):
        parse_phylip("1 9\nt1 ACGT\n")


def test_nexus_matrix():
    txt = textwrap.dedent("""\
        #NEXUS
        [a comment]
        BEGIN DATA;
        DIMENSIONS NTAX=2 NCHAR=8;
        FORMAT DATATYPE=DNA GAP=- MISSING=?;
        MATRIX
        'Homo sapiens' ACGT
        Pan            TTTT
        'Homo sapiens' ACGT
        Pan            AAAA
        ;
        END;
        """)
    seqs = parse_nexus(txt)
    assert seqs == {"Homo sapiens": "ACGTACGT", "Pan": "TTTTAAAA"}


def test_load_alignment_file_sniffs(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">q\nACGT\n")
    assert load_alignment_file(str(p)) == {"q": "ACGT"}


def test_parse_reference_treebase_nexus():
    # the reference ships raw NEXUS exports it never parses
    # (data/betacoronavirus/Treebase.zip); we can read them directly
    try:
        z = zipfile.ZipFile(
            "/root/reference/data/betacoronavirus/Treebase.zip"
        )
    except FileNotFoundError:
        pytest.skip("reference data not mounted")
    nexus_names = [n for n in z.namelist() if n.lower().endswith(".nex")]
    if not nexus_names:
        pytest.skip("no .nex members")
    parsed_any = False
    for name in nexus_names[:3]:
        text = z.read(name).decode("latin-1")
        try:
            seqs = parse_nexus(text)
        except ValueError:
            continue  # tree-only files have no matrix
        lens = {len(s) for s in seqs.values()}
        assert len(lens) == 1 and len(seqs) >= 2
        parsed_any = True
    if not parsed_any:
        pytest.skip("no matrix-bearing nexus members in first three")
