"""Shared test helpers: an offline WordPiece tokenizer with a tiny vocab."""

import tempfile

_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "cat",
    "what", "is", "a", "who", "where", "when", "why", "how", "did", "do",
    "paris", "france", "capital", "of", "city", "tokyo", "japan", "berlin",
    "germany", "rome", "italy", "madrid", "spain", "london", "england",
    "answer", "question", "context", "title", "section", "query", "text",
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
    "red", "green", "blue", "yellow", "black", "white", "big", "small",
] + [f"tok{i}" for i in range(64)]


def tiny_tokenizer():
    import transformers

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(_VOCAB))
        path = f.name
    return transformers.BertTokenizerFast(vocab_file=path)
