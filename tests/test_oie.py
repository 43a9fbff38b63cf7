"""OIE client contract tests (no Java server; conversion + formatting only)."""
from semanticsearch_tpu.oie.client import (
    _convert_extraction,
    extract_relations_from_paragraph,
    format_oie_triples_to_string,
    is_port_open,
)


def test_convert_extraction_openie5_shape():
    blob = {
        "extraction": {
            "arg1": {"text": "Barack Obama"},
            "rel": {"text": "was born in"},
            "arg2s": [{"text": "Hawaii"}],
        }
    }
    t = _convert_extraction(blob)
    assert t == {"subject": "Barack Obama", "relation": "was born in",
                 "object": "Hawaii"}
    assert _convert_extraction({"extraction": {}}) is None


def test_format_triples():
    triples = [
        {"subject": "A", "relation": "likes", "object": "B"},
        {"subject": "C", "relation": "is", "object": ""},
    ]
    assert format_oie_triples_to_string(triples) == "A likes B. C is."


def test_extraction_degrades_without_server():
    # No server on this port: must return [] rather than raise.
    assert extract_relations_from_paragraph("some text", port=59999) == []
    assert not is_port_open(59999)
