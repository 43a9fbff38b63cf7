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


def test_kill_processes_on_port():
    """Port-squatter cleanup (reference OIE_ubuntu.py:58-85): a process
    listening on the target port must be terminated."""
    import socket
    import subprocess
    import time

    from semanticsearch_tpu.oie.client import is_port_open, kill_processes_on_port

    # find a free port, then squat on it with a child process
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    squatter = subprocess.Popen([
        "python", "-c",
        f"import socket,time;s=socket.socket();"
        f"s.bind(('127.0.0.1',{port}));s.listen();time.sleep(60)",
    ])
    try:
        deadline = time.time() + 10
        while not is_port_open(port) and time.time() < deadline:
            time.sleep(0.2)
        assert is_port_open(port)
        killed = kill_processes_on_port(port)
        assert killed >= 1
        deadline = time.time() + 5
        while is_port_open(port) and time.time() < deadline:
            time.sleep(0.2)
        assert not is_port_open(port)
        assert squatter.poll() is not None
    finally:
        if squatter.poll() is None:
            squatter.kill()


def test_terminate_openie_processes():
    """Jar-process teardown (reference OIE.py:119-156): processes whose
    cmdline mentions an openie jar get terminated; others survive."""
    import subprocess
    import time

    from semanticsearch_tpu.oie.client import terminate_openie_processes

    import os
    import shutil
    import sys as _sys
    import tempfile

    # fake an OpenIE java process: a python interpreter whose argv[0]
    # basename is "java" and whose cmdline mentions the jar
    d = tempfile.mkdtemp()
    java = os.path.join(d, "java")
    os.symlink(_sys.executable, java)
    fake = subprocess.Popen(
        [java, "-c", "import time; time.sleep(60)",
         "openie-assembly-5.0.jar"],
    )
    bystander = subprocess.Popen(
        ["python", "-c", "import time; time.sleep(10)"],
    )
    try:
        time.sleep(0.5)
        n = terminate_openie_processes()
        assert n >= 1
        deadline = time.time() + 5
        while fake.poll() is None and time.time() < deadline:
            time.sleep(0.2)
        assert fake.poll() is not None
        assert bystander.poll() is None  # unrelated process untouched
    finally:
        for p in (fake, bystander):
            if p.poll() is None:
                p.kill()
        shutil.rmtree(d, ignore_errors=True)


def test_heuristic_extractor_contract():
    """Rule-based fallback: correct SVO on clear sentences, exact-duplicate
    filtering, every triple word present in the input, [] on empty."""
    from semanticsearch_tpu.oie.heuristic import extract_triples_heuristic

    t = extract_triples_heuristic(
        "The ancient aqueduct carried water to the Roman city.")
    assert t == [{"subject": "ancient aqueduct", "relation": "carried",
                  "object": "water to the Roman city"}]

    t = extract_triples_heuristic(
        "The committee, which met on Tuesday, approved the new budget.")
    subjects = {x["subject"] for x in t}
    relations = {x["relation"] for x in t}
    assert "committee" in subjects
    assert {"approved", "met"} <= relations

    # passive voice: auxiliary chain becomes the relation
    t = extract_triples_heuristic(
        "The fishing quota for trawlers was reduced this season.")
    assert t[0]["relation"] == "was reduced"

    # no invented tokens: every triple word appears in the source text
    text = ("Solar panels convert sunlight into electricity. "
            "Bees pollinate flowers and produce honey in the hive.")
    words = set(text.replace(".", "").split())
    for triple in extract_triples_heuristic(text):
        for field in ("subject", "relation", "object"):
            assert set(triple[field].split()) <= words, triple

    # exact-duplicate filter + degenerate inputs
    dup = extract_triples_heuristic(
        "IBM acquired the startup. IBM acquired the startup.")
    assert len(dup) == 1
    assert extract_triples_heuristic("") == []
    assert extract_triples_heuristic("word") == []


def test_enrich_tsv_heuristic_extractor(tmp_path):
    """enrich_chunk_tsv with the in-repo extractor fills the OIE columns
    without any server (the zero-dependency path the reference lacks)."""
    from semanticsearch_tpu.data.tsv import read_tsv, write_tsv
    from semanticsearch_tpu.oie.client import enrich_chunk_tsv

    rows = [
        {"chunk_id": "c0", "chunk_text":
         "The ancient aqueduct carried water to the Roman city."},
        {"chunk_id": "c1", "chunk_text": ""},
    ]
    src = tmp_path / "chunks.tsv"
    out = tmp_path / "enriched.tsv"
    write_tsv(str(src), rows, ["chunk_id", "chunk_text"])
    n = enrich_chunk_tsv(str(src), str(out), extractor="heuristic",
                         json_sidecar=str(tmp_path / "oie.json"))
    assert n == 2
    got = list(read_tsv(str(out)))
    assert "carried" in got[0]["raw_oie_data"]
    assert got[0]["raw_oie_data_plus_chunk_text"].endswith(
        rows[0]["chunk_text"])
    assert got[1]["raw_oie_data"] == ""
    import json as _json

    sidecar = _json.load(open(tmp_path / "oie.json"))
    assert sidecar[0]["triples"][0]["subject"] == "ancient aqueduct"
