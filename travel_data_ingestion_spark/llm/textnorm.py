"""Text normalization / mojibake repair — the C4/CCNet cleanup pass.

Crawled text arrives broken in predictable ways; this module fixes the
big four, deterministically and stdlib-only:

1. **Mojibake repair**: UTF-8 bytes mis-decoded as cp1252/latin-1
   ("CafÃ©", "â€œquotesâ€\\x9d") re-encode through the wrong codec and
   decode as UTF-8 — applied ONLY when (a) the text carries marker
   characters the mis-decoding produces (Ã, Â, â, legacy C1 range) and
   (b) the round trip both succeeds and strictly reduces those
   markers; clean text that legitimately mentions "Ã" survives because
   a failed or non-improving round trip keeps the original. Repair
   iterates (double-encoded text needs two passes), capped.
2. **Unicode NFC** so composed/decomposed spellings ("e"+U+0301 vs
   U+00E9) dedup and tokenize identically.
3. **Control characters** stripped (category Cc except tab/newline,
   plus zero-width joiners/BOM).
4. **Exotic spaces** (NBSP, thin/ideographic space — category Zs) to
   plain space.

Newlines are preserved (paragraph structure is signal); whitespace is
NOT collapsed here — that is the HTML extractor's and tokenizers' job.
Everything is total: None/empty pass through.
"""

from __future__ import annotations

import re
import unicodedata

# characters cp1252/latin1-misdecoded UTF-8 reliably produces: the
# UTF-8 lead bytes 0xC2-0xC3 (Â Ã), 0xE2 (â), and the C1 block
_MOJIBAKE_MARKERS = re.compile("[\u00c2\u00c3\u00e2\u0080-\u009f]")
_CTRL = re.compile(
    "[\u0000-\u0008\u000b-\u001f\u007f\u0080-\u009f\u200b-\u200d\ufeff]"
)


def _sloppy_cp1252(s: str) -> bytes | None:
    """Invert a cp1252 mis-decode the way real decoders performed it:
    cp1252 where defined, latin-1 passthrough for the five undefined
    codepoints (0x81 8D 8F 90 9D arrive as U+0081... in practice)."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            cp = ord(ch)
            if cp <= 0xFF:
                out.append(cp)
            else:
                return None
    return bytes(out)


def _demojibake_once(s: str) -> str | None:
    """One wrong-codec round trip, or None when it doesn't apply."""
    raw = _sloppy_cp1252(s)
    if raw is None:
        return None
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return None


# every non-ASCII Zs codepoint -> plain space (all Zs are in the BMP)
_ZS_TABLE = {
    cp: " "
    for cp in range(0x80, 0x10000)
    if unicodedata.category(chr(cp)) == "Zs"
}


def fix_text(s: str | None) -> str | None:
    """Normalize one string per the module contract. Total."""
    if not s:
        return s
    if s.isascii():
        # the 100 TB-dominant path: ASCII is already NFC, carries no
        # mojibake markers and no exotic spaces — only controls apply
        if "\r" in s:
            s = s.replace("\r\n", "\n").replace("\r", "\n")
        return _CTRL.sub("", s) if _CTRL.search(s) else s
    # 1) mojibake: only with markers present, only if markers reduce
    for _ in range(3):  # double-encoded needs 2; cap the loop
        before = len(_MOJIBAKE_MARKERS.findall(s))
        if not before:
            break
        fixed = _demojibake_once(s)
        if fixed is None or len(_MOJIBAKE_MARKERS.findall(fixed)) >= before:
            break
        s = fixed
    # 2) canonical composition
    s = unicodedata.normalize("NFC", s)
    # 3) control chars (keep \t and \n; fold \r\n / \r to \n first)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _CTRL.sub("", s)
    # 4) exotic spaces -> plain space
    return s.translate(_ZS_TABLE)


def normalize_text(df, text_col: str = "text"):
    """Arrow-batched normalization: returns the input with ``text``
    replaced by its fixed form and a ``was_fixed`` flag. Map-only."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("was_fixed", T.BooleanType()),
        ]
    )
    cols = df.select("doc_id", text_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fixed = [fix_text(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": fixed,
                    "was_fixed": [a != b for a, b in zip(fixed, pdf[text_col])],
                }
            )

    return cols.mapInPandas(batches, schema=schema)
