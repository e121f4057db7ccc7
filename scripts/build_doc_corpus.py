"""Rebuild data_local/doc_corpus_*.txt from the container image.

Harvests real English prose (licenses, READMEs, NEWS, copyright files,
policy docs) from /usr/share/common-licenses and /usr/share/doc,
ASCII-normalizes it, and writes a 95/5 train/heldout split cut at a
newline boundary. Deterministic for a given image (files walked in
sorted order). See data_local/README.md for why this corpus exists.
"""

import glob
import gzip
import os
import re

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data_local")
CAP_PER_DOC = 400_000
CAP_TOTAL = 24_000_000


def main():
    out, seen = [], 0

    def add(text, src):
        nonlocal seen
        text = text.replace("\r", "")
        if len(text) < 400:
            return
        out.append(f"\n\n===== {src} =====\n\n" + text)
        seen += len(text)

    for f in sorted(glob.glob("/usr/share/common-licenses/*")):
        if os.path.isfile(f):
            add(open(f, errors="ignore").read(), os.path.basename(f))

    cands = []
    for root, _, files in os.walk("/usr/share/doc"):
        for fn in files:
            if re.match(r"(README(\.\w+)?|.*\.txt(\.gz)?|NEWS(\.gz)?|"
                        r"copyright)$", fn):
                cands.append(os.path.join(root, fn))
    for f in sorted(cands):
        try:
            if f.endswith(".gz"):
                text = gzip.open(f, "rt", errors="ignore").read()
            else:
                text = open(f, errors="ignore").read()
        except Exception:
            continue
        if any(c in text for c in "\x00\x01\x02"):
            continue
        add(text[:CAP_PER_DOC], os.path.relpath(f, "/usr/share/doc"))
        if seen > CAP_TOTAL:
            break

    corpus = "".join(out).encode("ascii", "ignore").decode()
    os.makedirs(OUT_DIR, exist_ok=True)
    cut = int(len(corpus) * 0.95)
    while corpus[cut] != "\n":
        cut += 1
    with open(os.path.join(OUT_DIR, "doc_corpus_train.txt"), "w") as f:
        f.write(corpus[:cut])
    with open(os.path.join(OUT_DIR, "doc_corpus_heldout.txt"), "w") as f:
        f.write(corpus[cut:])
    print(f"corpus {len(corpus):,} bytes ({len(out)} docs): "
          f"train {cut:,} / heldout {len(corpus) - cut:,}")


if __name__ == "__main__":
    main()
