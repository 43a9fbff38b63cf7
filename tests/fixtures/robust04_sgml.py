"""Robust04/FBIS-faithful corpus fixture generator (VERDICT-r3 item 5).

Writes a deterministic miniature of the reference's raw input layout
(``data_process/integrate_data.py:44-132``): a TREC topics file of ``<top>``
blocks, a 4-column qrels file, and a directory of per-document files whose
text carries the FBIS dressing the cleaning stack exists for
(``simple_chunk_controller.py:298-401``): ``Language:/Article Type:``
headers, ``[Text]`` markers, editorial brackets (``[passage omitted]``,
``[Article by ...]``, recording tags), datelines with ``--`` dashes,
speaker attributions ``(Name) Sentence.``, protected acronyms with
mid-sentence periods, doubled quotes, and numbered lists.

``DOC_SAMPLES`` pins a handful of handcrafted documents verbatim so the
exact format is reviewable in-repo; ``write_fixture`` scales the same
patterns to a few hundred documents deterministically (seeded) for the
end-to-end test without committing hundreds of blobs.
"""
from __future__ import annotations

import os

import numpy as np

# Handcrafted format samples — committed verbatim, format-review anchors.
DOC_SAMPLES = {
    "FBIS3-10001": (
        "Language: Spanish Article Type:BFN [Text] SANTAFE DE BOGOTA, "
        "28 Feb (DPA) -- The agriculture ministry expanded the coffee "
        "export program. [passage omitted] The growers association "
        "welcomed the decision and the banks offered new credits. "
        "Members of the ANC. attended the talks in the capital."
    ),
    "FBIS3-10002": (
        "Language: Portuguese Article Type:CSO [Article by Maria Gomes] "
        "[Text] SAO PAULO, 3 Mar (AFP) -- (Gomes) The port authority "
        "modernized the container terminal. (Unidentified reporter) The "
        "dock workers union accepted the revised schedule. [end recording]"
    ),
    "FBIS3-10003": (
        "Language: Russian Article Type:BFN [From the \"Vesti\" program] "
        "MOSCOW, 12 Jan (ITAR-TASS) -- The energy commission reviewed "
        "the pipeline plan. The plan includes: 1) new compressor "
        "stations 2) repairs to the western line 3) a safety audit. "
        "\"\"The schedule is realistic,\"\" the minister said."
    ),
    "FBIS3-10004": "This document has no information.",
}

_CITIES = ["SANTAFE DE BOGOTA", "SAO PAULO", "MOSCOW", "HAVANA", "HANOI",
           "BEIJING", "CAIRO", "LAGOS", "LIMA", "MANILA"]
_AGENCIES = ["DPA", "AFP", "ITAR-TASS", "XINHUA", "PRENSA LATINA"]
_LANGS = ["Spanish", "Portuguese", "Russian", "Chinese", "Arabic"]
_TYPES = ["BFN", "CSO"]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun"]
_ACRONYMS = ["ANC", "NATO", "UN", "FBI", "EU", "TASS"]

# topic -> (keyword pair, supporting vocabulary)
TOPICS = [
    ("coffee exports", ["growers", "harvest", "beans", "shipments"]),
    ("fishing quotas", ["trawlers", "catch", "season", "fleet"]),
    ("pipeline safety", ["compressor", "inspection", "leaks", "valves"]),
    ("container ports", ["terminal", "dock", "cranes", "cargo"]),
    ("wheat subsidies", ["farmers", "grain", "silos", "prices"]),
    ("copper mining", ["smelter", "ore", "miners", "concentrate"]),
    ("textile tariffs", ["mills", "fabric", "looms", "imports"]),
    ("dam construction", ["reservoir", "turbines", "concrete", "flood"]),
    ("airline routes", ["carriers", "flights", "airports", "fares"]),
    ("timber logging", ["sawmills", "forests", "permits", "lumber"]),
    ("sugar refining", ["cane", "refinery", "syrup", "plantations"]),
    ("railway freight", ["locomotives", "wagons", "tracks", "depots"]),
]

_VERBS = ["expanded", "reviewed", "approved", "suspended", "modernized",
          "inspected", "announced", "reduced", "financed", "organized"]
_FILL_SUBJ = ["the ministry", "the commission", "local officials",
              "the provincial council", "industry delegates",
              "the state bank", "union representatives"]
_FILL_OBJ = ["the annual report", "a revised schedule", "the budget draft",
             "new regulations", "the joint venture", "a training program",
             "the regional survey"]


def _body_sentences(rng, kw, vocab, n_topic, n_fill):
    """Natural-ish sentences mixing topic keywords with newswire filler."""
    sents = []
    for _ in range(n_topic):
        sents.append(
            f"The {kw} program {rng.choice(_VERBS)} the "
            f"{rng.choice(vocab)} {rng.choice(['sector', 'plan', 'output'])}.")
    for _ in range(n_fill):
        sents.append(
            f"{rng.choice(_FILL_SUBJ).capitalize()} "
            f"{rng.choice(_VERBS)} {rng.choice(_FILL_OBJ)}.")
    rng.shuffle(sents)
    return sents


def _dress(rng, sentences):
    """Apply FBIS dressing around a sentence list."""
    lang = rng.choice(_LANGS)
    typ = rng.choice(_TYPES)
    city = rng.choice(_CITIES)
    agy = rng.choice(_AGENCIES)
    day, mon = int(rng.integers(1, 29)), rng.choice(_MONTHS)
    parts = [f"Language: {lang} Article Type:{typ} "]
    if rng.random() < 0.4:
        parts.append(f"[Article by {rng.choice(['Maria Gomes', 'Ivan Petrov', 'Li Wei'])}] ")
    parts.append("[Text] ")
    parts.append(f"{city}, {day} {mon} ({agy}) -- ")
    for i, s in enumerate(sentences):
        r = rng.random()
        if r < 0.08:
            parts.append("[passage omitted] ")
        elif r < 0.12:
            parts.append("[words indistinct] ")
        elif r < 0.18:
            # speaker attribution rewritten by preprocess_format
            parts.append(f"({rng.choice(['Gomes', 'Petrov', 'the minister'])}) {s} ")
            continue
        elif r < 0.24:
            ac = rng.choice(_ACRONYMS)
            parts.append(f"Members of the {ac}. endorsed the measure. ")
        elif r < 0.28:
            parts.append('""' + s.rstrip(".") + ',"" the spokesman said. ')
            continue
        elif r < 0.32:
            parts.append("The plan includes: 1) new permits 2) annual "
                         "audits 3) public reports. ")
        parts.append(s + " ")
    return "".join(parts).strip()


def write_fixture(root, n_rel_per_topic=5, n_nonrel_per_topic=3,
                  n_distractors=30, seed=0):
    """Write topics/qrels/docs under ``root``. Returns paths + expectations.

    qrels deliberately includes one malformed line, one missing-file doc,
    one duplicate pair, and one no-information document so the integrator's
    skip accounting is exercised (``integrate_data.py:111-157`` behaviors).
    """
    rng = np.random.default_rng(seed)
    docs_dir = os.path.join(root, "docs")
    os.makedirs(docs_dir, exist_ok=True)

    # ---- topics ----
    topics_path = os.path.join(root, "topics.robust04.txt")
    with open(topics_path, "w") as f:
        for t, (kw, vocab) in enumerate(TOPICS):
            num = 301 + t
            f.write(
                f"<top>\n<num> Number: {num}\n"
                f"<title> {kw}\n"
                f"<desc> Description:\nDocuments about {kw} and related "
                f"{vocab[0]} activity.\n"
                f"<narr> Narrative:\nA relevant document describes {kw} "
                f"programs, including {vocab[1]} and {vocab[2]} measures.\n"
                f"</top>\n")

    # ---- documents + qrels ----
    qrels_rows = []
    doc_id_counter = [20000]

    def new_doc(text):
        doc_id_counter[0] += 1
        did = f"FBIS3-{doc_id_counter[0]}"
        with open(os.path.join(docs_dir, did), "w") as f:
            f.write(text)
        return did

    # handcrafted samples participate as docs for topic 0 / no-info
    for did, text in DOC_SAMPLES.items():
        with open(os.path.join(docs_dir, did), "w") as f:
            f.write(text)

    distractor_ids = []
    for _ in range(n_distractors):
        t = int(rng.integers(len(TOPICS)))
        kw, vocab = TOPICS[t]
        sents = _body_sentences(rng, kw, vocab, n_topic=1,
                                n_fill=int(rng.integers(6, 14)))
        distractor_ids.append(new_doc(_dress(rng, sents)))

    for t, (kw, vocab) in enumerate(TOPICS):
        qid = str(301 + t)
        for _ in range(n_rel_per_topic):
            n_topic = int(rng.integers(4, 9))
            n_fill = int(rng.integers(4, 12))
            sents = _body_sentences(rng, kw, vocab, n_topic, n_fill)
            did = new_doc(_dress(rng, sents))
            qrels_rows.append((qid, did, 1))
        pool = rng.choice(len(distractor_ids),
                          size=min(n_nonrel_per_topic, len(distractor_ids)),
                          replace=False)
        for j in pool:
            qrels_rows.append((qid, distractor_ids[int(j)], 0))

    qrels_path = os.path.join(root, "qrels.robust04.txt")
    with open(qrels_path, "w") as f:
        for qid, did, lab in qrels_rows:
            f.write(f"{qid} 0 {did} {lab}\n")
        # exercised skip paths:
        f.write("301 0 FBIS3-10001 1\n")       # sample doc (valid row)
        f.write("301 0 FBIS3-10001 1\n")       # duplicate pair
        f.write("301 0 FBIS3-10004 1\n")       # no-information doc
        f.write("301 0 FBIS3-99999 1\n")       # missing file
        f.write("malformed line\n")            # malformed
        f.write("9999 0 FBIS3-10002 1\n")      # topic id not in topics file

    return {
        "topics": topics_path,
        "qrels": qrels_path,
        "docs_dir": docs_dir,
        "expected_written": len(qrels_rows) + 1,  # + FBIS3-10001 row
        "n_topics": len(TOPICS),
    }
