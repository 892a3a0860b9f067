"""Feature extraction layer: wordrate, static embeddings, LM, speech + factory."""
