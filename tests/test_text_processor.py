"""Text processor tests — mirrors reference coverage
(``/root/reference/tests/test_text_processor.py``): cleaning rules, length
heuristic, chunking word-boundary guarantees, plus our bucket-encoding layer.
"""

import numpy as np
import pytest

from vietvoice_tts_tpu.pipeline.text import (
    TextProcessor,
    chunk_text,
    clean_text,
    text_length,
)


@pytest.fixture
def processor(tiny_pack_dir):
    import os

    return TextProcessor(os.path.join(tiny_pack_dir, "vietvoice-tpu-v1", "vocab.txt"))


class TestFuzzInvariants:
    """Randomized-input invariants: the cleaning/chunking pipeline must
    never crash and must keep its guarantees on arbitrary unicode — the
    REST surface accepts any 1-1000-char string, so 'weird input' is a
    production path, not an edge case."""

    def _random_texts(self, n=200, seed=0):
        import random

        rng = random.Random(seed)
        pools = [
            # arbitrary unicode planes
            lambda: chr(rng.randrange(1, 0x2FFF)),
            # Vietnamese + ASCII letters (the whitelist)
            lambda: rng.choice("aăâbcdđeêghiklmnoôơpqrstuưvxyàáạảãầấậẩẫ "),
            # punctuation / digits / controls
            lambda: rng.choice(".,?!:;()-\n\t\r0123456789'\"@#$%^&*"),
            # emoji & symbols
            lambda: rng.choice("🙂🎉→⇒≠∑√€"),
        ]
        out = []
        for _ in range(n):
            k = rng.randrange(0, 400)
            out.append("".join(rng.choice(pools)() for _ in range(k)))
        return out

    def test_clean_text_never_crashes_and_output_is_clean(self):
        for t in self._random_texts():
            c = clean_text(t)
            assert isinstance(c, str)
            # Idempotence: cleaning a cleaned string is a no-op.
            assert clean_text(c) == c
            # No newlines/tabs survive; no doubled . or , (the reference
            # dedupes exactly these two — text_processor.py:66-67 — and
            # deliberately leaves ?? / !! alone).
            assert "\n" not in c and "\t" not in c and "\r" not in c
            for p in ".,":
                assert p + p not in c
            # Non-empty output ends with terminal punctuation.
            if c:
                assert c[-1] in ".!?,"

    def test_chunk_text_preserves_words_and_respects_budget(self):
        for t in self._random_texts(seed=1):
            c = clean_text(t)
            if not c:
                continue
            for max_chars in (10, 40, 120):
                chunks = chunk_text(c, max_chars=max_chars)
                assert all(ch.strip() for ch in chunks)
                # No word is ever split: every chunk's words appear in the
                # cleaned text's word sequence, in order.
                all_words = [
                    w for ch in chunks for w in ch.replace(",", " ").split()
                ]
                src_words = c.replace(",", " ").split()
                stripped = [w.strip(".!?,") for w in all_words if w.strip(".!?,")]
                src_stripped = [
                    w.strip(".!?,") for w in src_words if w.strip(".!?,")
                ]
                assert stripped == src_stripped, (t[:40], max_chars)

    def test_text_length_total_is_additive_enough(self):
        """The duration heuristic on chunks must roughly sum to the whole
        text's (the chunk planner budgets per chunk on this)."""
        for t in self._random_texts(n=60, seed=2):
            c = clean_text(t)
            if len(c) < 20:
                continue
            total = text_length(c, ".,?!:")
            parts = chunk_text(c, max_chars=40)
            part_sum = sum(text_length(p, ".,?!:") for p in parts)
            assert part_sum >= total * 0.8
            assert part_sum <= total * 1.6  # punctuation may be added


class TestCleanText:
    def test_keeps_vietnamese(self):
        assert clean_text("Xin chào thế giới") == "Xin chào thế giới."

    def test_strips_invalid_chars(self):
        out = clean_text("hello✨world")
        assert "✨" not in out
        assert out == "hello world."

    def test_newlines_become_sentences(self):
        out = clean_text("dòng một\ndòng hai")
        assert out == "dòng một. dòng hai."

    def test_soft_stops_to_comma(self):
        assert clean_text("a; b: c (d)") == "a, b, c ,d,"

    def test_dedupes_punctuation(self):
        assert clean_text("xin...chào,,,bạn") == "xin.chào,bạn."

    def test_appends_trailing_period(self):
        assert clean_text("không dấu câu").endswith(".")

    def test_keeps_existing_terminal(self):
        assert clean_text("câu hỏi?") == "câu hỏi?"

    def test_collapses_whitespace(self):
        assert "  " not in clean_text("nhiều    khoảng   trắng")


class TestTextLength:
    def test_ascii(self):
        assert text_length("abc", r".,?!:") == 3

    def test_pause_weighting(self):
        # The pause pattern ".,?!:" is used as a *regex* (reference
        # text_processor.py:41): any char + optional ',' + literal "!:".
        # "a." has no match → plain byte length.
        assert text_length("a.", r".,?!:") == 2
        # "ab!:" contains one match ("b!:" preceded by any char) → +3.
        assert text_length("ab!:", r".,?!:") == 4 + 3

    def test_utf8_bytes(self):
        # 'ế' is 3 UTF-8 bytes
        assert text_length("ế", r".,?!:") == 3


class TestChunkText:
    def test_empty(self):
        assert chunk_text("") == []
        assert chunk_text("   ") == []

    def test_short_single_chunk(self):
        assert chunk_text("Một câu ngắn.", max_chars=135) == ["Một câu ngắn."]

    def test_no_word_split(self):
        text = " ".join(["từngữ"] * 100) + "."
        for chunk in chunk_text(text, max_chars=40):
            for word in chunk.split():
                assert word in ("từngữ", "từngữ.")

    def test_respects_max_chars_softly(self):
        text = ". ".join(["câu thứ " + str(i) for i in range(20)]) + "."
        chunks = chunk_text(text, max_chars=50)
        assert all(len(c) <= 50 for c in chunks)

    def test_short_chunks_merged(self):
        chunks = chunk_text("Câu dài hơn bốn từ ở đây. Ngắn.", max_chars=60)
        assert len(chunks) == 1

    def test_single_long_word(self):
        word = "a" * 300
        chunks = chunk_text(word + ".", max_chars=100)
        assert chunks  # doesn't crash, emits something


class TestVocabEncoding:
    def test_known_chars_roundtrip(self, processor):
        ids = processor.text_to_indices([list("abc")])
        assert ids.shape == (1, 3)
        assert ids.dtype == np.int32
        inv = {v: k for k, v in processor.vocab_char_map.items()}
        assert [inv[i] for i in ids[0]] == ["a", "b", "c"]

    def test_unknown_maps_to_zero(self, processor):
        ids = processor.text_to_indices([list("✨")])
        assert ids[0, 0] == 0

    def test_encode_padded(self, processor):
        row, n = processor.encode_padded("ab", 8)
        assert row.shape == (8,)
        assert n == 2
        assert (row[2:] == -1).all()

    def test_encode_batch(self, processor):
        ids, lens = processor.encode_batch(["a", "abc"], 4)
        assert ids.shape == (2, 4)
        assert list(lens) == [1, 3]

    def test_truncates_to_bucket(self, processor):
        row, n = processor.encode_padded("abcdef", 4)
        assert n == 4
        assert (row != -1).all()
