"""Per-language stopword lists for the analyzer.

Parity: reference `vod_configs/utils/es_body.py` — the `__auto_stopwords__`
language patching (`validate_es_body:101`) over ES's 33 language analyzers
(`:32`). The native analyzer filters English stopwords in C++; other languages
filter post-hoc by hashing the list with the same FNV function (exact, since
stopwords hash deterministically into the same id space).
"""

from __future__ import annotations

STOPWORDS: dict[str, list[str]] = {
    "english": [
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
        "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these", "they", "this",
        "to", "was", "will", "with",
    ],
    "french": [
        "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du", "elle",
        "en", "et", "eux", "il", "je", "la", "le", "les", "leur", "lui",
        "ma", "mais", "me", "meme", "mes", "moi", "mon", "ne", "nos",
        "notre", "nous", "on", "ou", "par", "pas", "pour", "qu", "que",
        "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes", "toi",
        "ton", "tu", "un", "une", "vos", "votre", "vous",
    ],
    "german": [
        "aber", "alle", "als", "also", "am", "an", "auch", "auf", "aus",
        "bei", "bin", "bis", "da", "das", "dass", "dem", "den", "der",
        "des", "die", "doch", "dort", "durch", "ein", "eine", "einem",
        "einen", "einer", "eines", "er", "es", "fur", "hat", "im", "in",
        "ist", "ja", "kann", "mit", "nach", "nicht", "noch", "nur", "oder",
        "sich", "sie", "sind", "so", "uber", "um", "und", "von", "vor",
        "war", "was", "wie", "wir", "zu", "zum", "zur",
    ],
    "spanish": [
        "al", "como", "con", "de", "del", "el", "ella", "en", "entre",
        "era", "es", "esta", "este", "fue", "ha", "la", "las", "le", "lo",
        "los", "mas", "muy", "no", "o", "para", "pero", "por", "que", "se",
        "si", "sin", "sobre", "su", "sus", "un", "una", "uno", "y", "ya",
    ],
    "italian": [
        "a", "al", "alla", "che", "chi", "ci", "come", "con", "da", "dei",
        "del", "della", "di", "e", "gli", "ha", "il", "in", "la", "le",
        "lo", "ma", "ne", "nel", "non", "per", "piu", "se", "si", "sono",
        "su", "un", "una", "uno",
    ],
    "portuguese": [
        "a", "ao", "as", "com", "da", "das", "de", "do", "dos", "e", "em",
        "mais", "mas", "na", "nas", "no", "nos", "nao", "o", "os", "ou",
        "para", "pela", "pelo", "por", "que", "se", "sem", "seu", "sua",
        "um", "uma",
    ],
    "dutch": [
        "aan", "als", "bij", "dat", "de", "den", "der", "des", "deze",
        "die", "dit", "doch", "een", "en", "er", "haar", "heeft", "hem",
        "het", "hij", "hoe", "hun", "ik", "in", "is", "je", "kan", "maar",
        "met", "mij", "naar", "niet", "nog", "nu", "of", "om", "ook", "op",
        "te", "tot", "uit", "van", "voor", "was", "wat", "zijn", "zo",
    ],
    "danish": [
        "af", "alle", "at", "da", "de", "den", "denne", "der", "det",
        "dette", "en", "er", "et", "for", "fra", "han", "har", "hun", "i",
        "ikke", "jeg", "med", "men", "og", "om", "op", "pa", "som", "til",
        "var", "vi", "vil",
    ],
    "swedish": [
        "alla", "att", "av", "de", "den", "det", "du", "efter", "en",
        "ett", "for", "fran", "han", "har", "hon", "i", "inte", "jag",
        "med", "men", "och", "om", "pa", "som", "till", "var", "vi", "vid",
    ],
    "norwegian": [
        "av", "at", "de", "den", "det", "du", "en", "er", "et", "for",
        "fra", "han", "har", "hun", "i", "ikke", "jeg", "med", "men", "og",
        "om", "pa", "som", "til", "var", "vi", "vil",
    ],
}


def stopword_ids(language: str, vocab_size: int) -> set[int]:
    """FNV-hash the language's stopwords into the analyzer's id space."""
    from .loader import fnv1a_id

    words = STOPWORDS.get(language)
    if words is None:
        raise ValueError(f"No stopword list for {language!r}; known: {sorted(STOPWORDS)}")
    return {fnv1a_id(w, vocab_size) for w in words}
