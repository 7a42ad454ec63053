"""NCBI dump -> runtime bundle builder round trip: the generated files load
through the standard Taxonomy/report paths."""

import textwrap

from lmat_tpu.apps.build_taxonomy import parse_ncbi_dumps, write_bundle
from lmat_tpu.core.taxonomy import Taxonomy


def write_dumps(tmp_path):
    nodes = textwrap.dedent(
        """\
        1\t|\t1\t|\tno rank\t|
        131567\t|\t1\t|\tno rank\t|
        2\t|\t131567\t|\tsuperkingdom\t|
        1224\t|\t2\t|\tphylum\t|
        561\t|\t1224\t|\tgenus\t|
        562\t|\t561\t|\tspecies\t|
        83333\t|\t562\t|\tstrain\t|
        9606\t|\t131567\t|\tspecies\t|
        99999\t|\t1\t|\tclass\t|
        """
    )
    names = textwrap.dedent(
        """\
        1\t|\troot\t|\t\t|\tscientific name\t|
        131567\t|\tcellular organisms\t|\t\t|\tscientific name\t|
        2\t|\tBacteria\t|\t\t|\tscientific name\t|
        1224\t|\tProteobacteria\t|\t\t|\tscientific name\t|
        561\t|\tEscherichia\t|\t\t|\tscientific name\t|
        562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|
        562\t|\tE. coli\t|\t\t|\tcommon name\t|
        83333\t|\tEscherichia coli K-12\t|\t\t|\tscientific name\t|
        9606\t|\tHomo sapiens\t|\t\t|\tscientific name\t|
        99999\t|\tMystery\t|\t\t|\tscientific name\t|
        """
    )
    (tmp_path / "nodes.dmp").write_text(nodes)
    (tmp_path / "names.dmp").write_text(names)
    return str(tmp_path / "nodes.dmp"), str(tmp_path / "names.dmp")


def test_bundle_roundtrip(tmp_path):
    nodes, names = write_dumps(tmp_path)
    parent, rank, nm = parse_ncbi_dumps(nodes, names)
    assert rank[2] == "superkingdom"
    assert nm[562] == "Escherichia coli"

    out = tmp_path / "bundle"
    tids = write_bundle(parent, rank, nm, str(out), keep={83333, 9606})
    # pruned to keep + ancestors; 99999 dropped
    assert 99999 not in tids and 83333 in tids and 1224 in tids

    tax = Taxonomy.from_lmat_file(str(out / "taxtree.dat"))
    tax.load_depth_file(str(out / "depth.dat"))
    tax.load_rank_file(str(out / "ranks.dat"))
    assert tax.path_to_root(83333) == (562, 561, 1224, 2, 131567, 1)
    assert tax.depth[83333] == 6
    assert tax.rank[83333] == "strain"
    assert tax.rank[2] == "kingdom"
    assert tax.names[562] == "Escherichia coli"

    # rank-ids file parses through the fastsummary name scan convention
    info = (out / "taxids.info").read_text().splitlines()
    row = [l for l in info if l.startswith("ktaxid=83333,")][0]
    assert row.split("\t")[-1] == "strain,Escherichia coli K-12"

    # 16-bit map covers all tids
    m = dict(l.split() for l in (out / "m32to16.map").read_text().splitlines())
    assert set(map(int, m)) == set(tids)
