"""Generate golden class-name -> token fixtures for the lemmatizer.

The class-name tokenization rules + WordNet verb lemmatization pin the
supervision targets of the whole system (the tokens are what gets looked up
in Word2Vec; parity target /root/reference/auxiliary/auxiliary_word2vec.py:212-219).
This tool maps every class name in assets/class_vocab/*.txt through
text.class_names.class_name_to_words and writes the result to
tests/fixtures/lemma_goldens.json, recording which lemmatizer backend
produced it:

  * with the NLTK WordNet corpus installed -> provenance "nltk-wordnet"
    (exact reference parity), and the tool additionally reports every token
    where the offline morphy fallback would diverge — fix the vendored
    subset (tools/vendor_wordnet.py --write) until the diff is empty.
  * without the corpus (air-gapped hosts) -> provenance
    "vendored-wordnet-morphy-fallback": the fixture pins the fallback
    driven by text/wordnet_verbs/{verb.exc,index.verb.lemmas}. Re-run this
    tool the moment the corpus is installable and commit the diff (if any).

Usage:  python tools/gen_lemma_goldens.py [--out tests/fixtures/lemma_goldens.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCABS = {  # dataset rule name -> vocab file
    "ucf101": "assets/class_vocab/ucf101.txt",
    "hmdb51": "assets/class_vocab/hmdb51.txt",
    "kinetics": "assets/class_vocab/kinetics700.txt",
    "activitynet": "assets/class_vocab/activitynet.txt",
}


def load_vocab(path: str):
    with open(path) as f:
        return [ln.rstrip("\n") for ln in f
                if ln.strip() and not ln.startswith("#")]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="tests/fixtures/lemma_goldens.json")
    args = p.parse_args(argv)

    from zeroshotvideoclassification_tpu.text import lemma
    from zeroshotvideoclassification_tpu.text.class_names import (
        class_name_to_words,
    )

    backend = lemma._nltk_backend()
    provenance = ("nltk-wordnet" if backend is not None
                  else "vendored-wordnet-morphy-fallback")

    goldens = {}
    for ds, path in VOCABS.items():
        goldens[ds] = {name: class_name_to_words(ds, name)
                       for name in load_vocab(path)}

    if backend is not None:
        # report fallback divergences so the embedded tables can be extended
        lemma._nltk_backend.cache_clear()
        real = lemma._nltk_backend
        lemma._nltk_backend = lambda: None  # force the fallback
        try:
            n_diff = 0
            for ds, path in VOCABS.items():
                for name in load_vocab(path):
                    fb = class_name_to_words(ds, name)
                    if fb != goldens[ds][name]:
                        n_diff += 1
                        print(f"DIVERGES {ds}: {name!r} wordnet="
                              f"{goldens[ds][name]} fallback={fb}",
                              file=sys.stderr)
            print(f"fallback divergences: {n_diff}", file=sys.stderr)
        finally:
            lemma._nltk_backend = real
            lemma._nltk_backend.cache_clear()

    payload = {
        "_provenance": provenance,
        "_note": ("class name -> word2vec lookup tokens, per dataset rule; "
                  "regenerate with tools/gen_lemma_goldens.py (under real "
                  "NLTK WordNet when available)"),
        "datasets": goldens,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    n = sum(len(v) for v in goldens.values())
    print(f"wrote {args.out}: {n} classes, provenance={provenance}")


if __name__ == "__main__":
    main()
