#!/usr/bin/env python3
"""Convert word-vector files to the framework's .kv format.

The reference's embeddings extractor notes ENG1000 "just has to be converted
to the .kv format first — we'll provide a script to do that"
(reference: encoding/features/embeddings.py:51). This is that script, for any
supported source format:

    python scripts/convert_vectors.py input.bin output.kv             # word2vec binary
    python scripts/convert_vectors.py glove.txt out.kv --no-header    # GloVe text
    python scripts/convert_vectors.py eng1000.w2v.txt out.kv          # w2v text w/ header

.kv files load fastest (npz bundle, no text parsing) and are what
StaticEmbeddingFeatureExtractor memory-maps by default.
"""

import argparse

from litcoder_core_tpu.features.embeddings import SimpleKeyedVectors


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="source vectors (.bin/.txt/.w2v.txt)")
    parser.add_argument("output", help="destination .kv path")
    parser.add_argument("--binary", action="store_true",
                        help="force word2vec binary parsing")
    parser.add_argument("--no-header", action="store_true",
                        help="force GloVe-style headerless text parsing")
    args = parser.parse_args()

    ext = args.input.lower()
    binary = args.binary or ext.endswith((".bin", ".bin.gz"))
    no_header = args.no_header or (
        ext.endswith((".txt", ".txt.gz")) and not ext.endswith(".w2v.txt")
    )
    kv = SimpleKeyedVectors.load_word2vec_format(
        args.input, binary=binary, no_header=no_header
    )
    kv.save_kv(args.output)
    print(f"wrote {args.output}: {len(kv.index_to_key)} words, "
          f"{kv.vector_size}-D")


if __name__ == "__main__":
    main()
