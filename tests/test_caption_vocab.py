"""caption_vocab tool (completes the reference's unfinished make_words.py)."""

import json
import os

from zeroshotvideoclassification_tpu.tools.caption_vocab import main, pos_bucket


def test_pos_bucket_fallback_is_total():
    # With or without the NLTK corpus, every word lands in some bucket.
    for w in ["dog", "running", "blue", "quickly", "zzzzqq"]:
        assert pos_bucket(w) in {"noun", "verb", "adj", "adv", "other"}


def test_vocab_main_buckets_and_frequencies(tmp_path):
    root = tmp_path / "frames"
    (root / "vid_a").mkdir(parents=True)
    (root / "vid_b").mkdir()
    with open(root / "vid_a" / "captions.json", "w") as f:
        json.dump(["A dog is running fast.", "The dog jumps!"], f)
    with open(root / "vid_b" / "captions.json", "w") as f:
        json.dump(["Dog, dog, DOG."], f)

    out = tmp_path / "vocab.json"
    main(["--captions_root", str(root), "--out", str(out)])
    assert os.path.exists(out)
    with open(out) as f:
        vocab = json.load(f)

    counts = {}
    for bucket in vocab.values():
        for w, n in bucket.items():
            counts[w] = counts.get(w, 0) + n
    # tokenization: lowercase alpha runs across all folders' captions
    assert counts["dog"] == 5
    assert counts["is"] == 1 and counts["the"] == 1
    # 5 ("a dog is running fast") + 3 ("the dog jumps") + 3 ("dog dog dog")
    assert sum(counts.values()) == 11
