"""(Re)extract the vendored WordNet verb-morphology subset from a REAL corpus.

The offline lemmatizer fallback (text/lemma.py) is driven by
text/wordnet_verbs/{verb.exc,index.verb.lemmas} — a WordNet 3.0 subset that
was transcribed on an air-gapped host (see wordnet_verbs/README.md). This
tool replaces transcription with extraction the moment a real corpus is
reachable:

    python tools/vendor_wordnet.py --wordnet /path/to/WordNet-3.0/dict
    python tools/vendor_wordnet.py            # use an installed NLTK corpus

It recomputes the class-vocabulary token set (assets/class_vocab/* through
the class-name tokenizer, lemmatization disabled), extracts from the real
corpus exactly the entries that can influence those tokens, diffs against
the committed files, and with --write rewrites them. After a --write, run
tools/gen_lemma_goldens.py and commit both diffs.

Extraction rules (deterministic):
  * verb.exc subset: every exception entry whose inflected form is a vocab
    token, plus every other entry sharing a base with one of those (so
    -ed/-ing partner forms travel together).
  * index.verb.lemmas subset: every verb lemma that is a vocab token, a rule
    -derived morphy candidate of a vocab token, or a target of an extracted
    exception entry.
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA_DIR = os.path.join(ROOT, "zeroshotvideoclassification_tpu", "text",
                        "wordnet_verbs")

VOCABS = {
    "ucf101": "assets/class_vocab/ucf101.txt",
    "hmdb51": "assets/class_vocab/hmdb51.txt",
    "kinetics": "assets/class_vocab/kinetics700.txt",
    "activitynet": "assets/class_vocab/activitynet.txt",
}


def vocab_tokens() -> set:
    """All distinct tokens the class vocabularies feed into verbs2basicform."""
    import zeroshotvideoclassification_tpu.text.class_names as cn

    raw = set()
    orig = cn.verbs2basicform
    cn.verbs2basicform = lambda ws: (raw.update(ws), list(ws))[1]
    try:
        for ds, rel in VOCABS.items():
            with open(os.path.join(ROOT, rel)) as f:
                for ln in f:
                    if ln.strip() and not ln.startswith("#"):
                        cn.class_name_to_words(ds, ln.rstrip("\n"))
    finally:
        cn.verbs2basicform = orig
    return raw


def load_real_corpus(wordnet_dir):
    """Return (exc: form->bases, lemmas: set) from a real WordNet corpus."""
    if wordnet_dir:
        exc_path = os.path.join(wordnet_dir, "verb.exc")
        idx_path = os.path.join(wordnet_dir, "index.verb")
        exc = {}
        with open(exc_path) as f:
            for ln in f:
                parts = ln.split()
                if parts:
                    exc[parts[0]] = parts[1:]
        lemmas = set()
        with open(idx_path) as f:
            for ln in f:
                if ln.startswith("  "):  # license header lines
                    continue
                parts = ln.split()
                if parts:
                    lemmas.add(parts[0])
        return exc, lemmas
    # fall back to an installed NLTK corpus
    from nltk.corpus import wordnet as wn

    wn.ensure_loaded()
    exc = {k: list(v) for k, v in wn._exception_map["v"].items()}
    lemmas = {lem for lem, posmap in wn._lemma_pos_offset_map.items()
              if "v" in posmap}
    return exc, lemmas


# The SAME rule table the runtime lemmatizer applies — imported, not
# copied, so the closure guarantee below can never desynchronize from a
# lemma.py rule edit.
from zeroshotvideoclassification_tpu.text.lemma import (  # noqa: E402
    _VERB_RULES,
)


def rule_candidates(form: str) -> set:
    """All forms morphy's detachment rules can ever derive from `form`."""
    out, frontier = set(), [form]
    while frontier:
        nxt = [f[: -len(s)] + r for f in frontier
               for s, r in _VERB_RULES if f.endswith(s)]
        nxt = [f for f in nxt if f and f not in out]
        out.update(nxt)
        frontier = nxt
    return out


def extract(exc, lemmas, tokens):
    sub_exc = {w: exc[w] for w in tokens if w in exc}
    bases = {b for bs in sub_exc.values() for b in bs}
    for w, bs in exc.items():
        if any(b in bases for b in bs):
            sub_exc[w] = bs
    sub_lemmas = set()
    for t in tokens:
        if t in lemmas:
            sub_lemmas.add(t)
        sub_lemmas.update(c for c in rule_candidates(t) if c in lemmas)
    sub_lemmas.update(b for bs in sub_exc.values() for b in bs if b in lemmas)
    return sub_exc, sub_lemmas


def render(sub_exc, sub_lemmas):
    exc_txt = "".join(f"{w} {' '.join(sub_exc[w])}\n" for w in sorted(sub_exc))
    idx_txt = "".join(w + "\n" for w in sorted(sub_lemmas))
    return exc_txt, idx_txt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--wordnet", default=None,
                   help="path to a WordNet 3.0 dict/ dir (verb.exc + "
                        "index.verb); default: installed NLTK corpus")
    p.add_argument("--write", action="store_true",
                   help="rewrite the vendored files (default: diff only)")
    args = p.parse_args(argv)

    tokens = vocab_tokens()
    print(f"{len(tokens)} distinct vocab tokens")
    exc, lemmas = load_real_corpus(args.wordnet)
    print(f"real corpus: {len(exc)} verb exceptions, {len(lemmas)} verb lemmas")
    sub_exc, sub_lemmas = extract(exc, lemmas, tokens)
    exc_txt, idx_txt = render(sub_exc, sub_lemmas)

    n_diff = 0
    for name, new in (("verb.exc", exc_txt), ("index.verb.lemmas", idx_txt)):
        path = os.path.join(DATA_DIR, name)
        old = open(path).read() if os.path.exists(path) else ""
        diff = list(difflib.unified_diff(
            old.splitlines(True), new.splitlines(True),
            f"committed/{name}", f"real-corpus/{name}"))
        n_diff += sum(1 for ln in diff
                      if ln[:1] in "+-" and ln[:3] not in ("+++", "---"))
        sys.stdout.writelines(diff)
        if args.write:
            with open(path, "w") as f:
                f.write(new)
    print(f"\n{n_diff} changed lines vs committed subset"
          + (" (files rewritten — now run tools/gen_lemma_goldens.py)"
             if args.write else " (dry run; --write to apply)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
