"""S7 XML and S8 REST source tests (fixture-fed, no network)."""

from __future__ import annotations

import pytest

from gramene_mongodb_spark.operators.closure import transitive_closure
from gramene_mongodb_spark.sources import rest, xml

INTERPRO_XML = """<?xml version="1.0"?>
<interprodb>
  <interpro id="IPR000001" type="Domain" short_name="Kringle">
    <name>Kringle</name>
    <abstract>Kringle domains are <i>triple-looped</i> structures.</abstract>
  </interpro>
  <interpro id="IPR000002" type="Family" short_name="Fam2">
    <name>Family two</name>
  </interpro>
</interprodb>
"""

PARENT_CHILD = """IPR000001::Kringle::
--IPR000010::Sub one::
----IPR000011::Sub sub::
--IPR000020::Sub two::
IPR000002::Fam2::
--IPR000030::Other child::
"""


def test_read_interpro_xml(spark, tmp_path):
    p = tmp_path / "interpro.xml"
    p.write_text(INTERPRO_XML)
    rows = {r.id: r for r in xml.read_interpro_xml(spark, str(p)).collect()}
    assert rows["IPR000001"].type == "Domain"
    assert rows["IPR000001"].abstract == "Kringle domains are triple-looped structures."
    assert rows["IPR000002"].abstract is None


def test_read_interpro_xml_distributed_equals_driver_path(spark, tmp_path):
    """The large-file record-split path (lineSep + mapInPandas ET) must
    return exactly the driver-side parse — on a fixture with nested
    markup in abstracts, an entry missing optional children, and a
    multi-entry layout; and the size dispatch must pick it for files
    over the ceiling."""
    p = tmp_path / "interpro.xml"
    p.write_text(INTERPRO_XML)
    want = sorted(map(tuple, xml.read_interpro_xml(spark, str(p)).collect()))
    got = sorted(
        map(tuple, xml.read_interpro_xml_distributed(spark, str(p)).collect())
    )
    assert got == want and len(got) == 2

    # dispatch: a 1-byte ceiling forces the distributed path
    via_dispatch = sorted(
        map(
            tuple,
            xml.read_interpro_xml(spark, str(p), driver_max_bytes=1).collect(),
        )
    )
    assert via_dispatch == want


def test_parent_child_tree_edges_and_closure(spark, tmp_path):
    p = tmp_path / "tree.txt"
    p.write_text(PARENT_CHILD)
    edges = xml.read_parent_child_tree(spark, str(p))
    got = {(r.child, r.parent) for r in edges.collect()}
    assert got == {
        ("IPR000010", "IPR000001"),
        ("IPR000011", "IPR000010"),
        ("IPR000020", "IPR000001"),
        ("IPR000030", "IPR000002"),
    }
    closure = transitive_closure(edges)
    anc = {
        r.node: r.ancestor
        for r in closure.filter("node = 'IPR000011'").collect()
    }
    assert set(closure.filter("node = 'IPR000011'").toPandas()["ancestor"]) == {
        "IPR000010", "IPR000001",
    }


def test_fetch_json_lut(spark):
    def fake(url):
        assert url == "https://example.test/q"
        return '{"results": [{"gene": "AT1", "desc": "kinase"}, {"gene": "AT2", "desc": null}]}'

    df = rest.fetch_json_lut(
        spark, "https://example.test/q", fake, record_path=("results",),
        schema="gene STRING, desc STRING",
    )
    rows = {r.gene: r.desc for r in df.collect()}
    assert rows == {"AT1": "kinase", "AT2": None}


def test_fetch_tsv_lut_drops_malformed(spark):
    def fake(url):
        return "id\tname\ng1\tGene One\nbadline\ng2\tGene Two\n"

    df = rest.fetch_tsv_lut(
        spark, "u", fake, columns=["id", "name"], skip_header=True
    )
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {"g1": "Gene One", "g2": "Gene Two"}  # 'badline' dropped


def test_fetch_json_lut_bad_path(spark):
    with pytest.raises(ValueError):
        rest.fetch_json_lut(spark, "u", lambda u: '{"a": 1}', record_path=("a",))
