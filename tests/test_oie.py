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
