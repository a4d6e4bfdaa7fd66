#!/usr/bin/env bash
# One-command bootstrap: clean checkout -> runnable framework.
#
# The TPU-native equivalent of the reference's install.sh +
# assets/download_word2vec.sh (/root/reference/install.sh:18-29): no pip
# installs are needed (jax/flax/optax/numpy are baked into TPU VM images);
# this script fetches the Word2Vec asset, builds its npz cache, fetches the
# NLTK WordNet corpus (optional — the embedded morphy fallback covers its
# absence), builds the native JPEG decoder, and ports any pretrained torch
# checkpoints dropped into assets/pretrained/.
#
# Usage:  scripts/setup.sh [--skip-download]

set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_DOWNLOAD=0
[[ "${1:-}" == "--skip-download" ]] && SKIP_DOWNLOAD=1

mkdir -p assets assets/pretrained

# 1) GoogleNews Word2Vec binary (same URL as the reference's
#    assets/download_word2vec.sh)
W2V=assets/GoogleNews-vectors-negative300.bin
if [[ ! -f "$W2V" && "$SKIP_DOWNLOAD" == 0 ]]; then
  echo "== downloading GoogleNews Word2Vec (~3.5 GB) =="
  wget -q --show-progress \
    https://s3.amazonaws.com/dl4j-distribution/GoogleNews-vectors-negative300.bin.gz \
    -O "$W2V.gz"
  gunzip -f "$W2V.gz"
fi

# 2) Parse + unit-normalize + cache (fast mmap-able npz; replaces the
#    reference's gensim init_sims/re-save dance)
if [[ -f "$W2V" && ! -f assets/word2vec_cache.npz ]]; then
  echo "== building word2vec cache =="
  python -m zeroshotvideoclassification_tpu.tools.prepare_word2vec \
    --bin "$W2V" --out assets/word2vec_cache.npz
fi

# 3) NLTK WordNet corpus (exact lemmatizer parity; morphy fallback otherwise)
if [[ "$SKIP_DOWNLOAD" == 0 ]]; then
  python - <<'EOF' || echo "WordNet download failed; embedded morphy fallback stays active"
import nltk
nltk.download("wordnet", quiet=True)
EOF
fi

# 4) Native JPEG batch decoder (GIL-free libjpeg path for the host pipeline)
if command -v make >/dev/null; then
  echo "== building native decoder =="
  make -C native || echo "native build failed; cv2 fallback stays active"
fi

# 5) Port any torch checkpoints the user dropped into assets/pretrained/
#    (torchvision r3d_18/mc3_18/r2plus1d_18 .pth, c3d.pickle, or reference
#    checkpoint.pth.tar) to framework npz, enabling pretrained auto-load.
shopt -s nullglob
for src in assets/pretrained/*.pth assets/pretrained/*.pth.tar assets/c3d.pickle; do
  [[ -f "$src" ]] || continue
  base=$(basename "$src")
  net=""
  case "$base" in
    *r2plus1d*) net=r2plus1d_18 ;;
    *mc3*)      net=mc3_18 ;;
    *r3d*)      net=r3d_18 ;;
    *c3d*)      net=c3d ;;
  esac
  [[ -z "$net" ]] && { echo "skip $src (can't infer --network)"; continue; }
  out="assets/pretrained/$net.npz"
  [[ -f "$out" ]] && continue
  echo "== porting $src -> $out =="
  python -m zeroshotvideoclassification_tpu.tools.port_checkpoint \
    --src "$src" --network "$net" --out "$out" || true
done

echo "setup complete. Smoke check:"
python - <<'EOF'
import zeroshotvideoclassification_tpu as z
from zeroshotvideoclassification_tpu.data import native_decode
print("  package import ok;",
      "native decoder:", "ok" if native_decode.available() else "cv2 fallback")
EOF
