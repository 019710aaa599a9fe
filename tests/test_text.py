"""Golden tests: text frontend vs reference vosk_tts g2p/synth encoders."""

import random
import re

import numpy as np
import pytest

import oracle

from vosk_tts_tpu.text import (
    convert,
    plain_symbol_map,
    multistream_symbol_map,
    g2p_plain,
    g2p_noembed,
    g2p_multistream,
)

ref_g2p = oracle.vosk_tts("g2p")
ref_synth_mod = oracle.vosk_tts("synth")


class FakeModel:
    def __init__(self, id_map, dic=None):
        self.dic = dic or {}
        self.config = {"phoneme_id_map": id_map}
        self.tokenizer = None


def _random_word(rng):
    letters = "абвгдежзийклмнопрстуфхцчшщъыьэюяё"
    n = rng.randint(2, 12)
    word = "".join(rng.choice(letters) for _ in range(n))
    if rng.random() < 0.8:
        pos = rng.randrange(len(word))
        word = word[:pos] + "+" + word[pos:]
    return word


def test_g2p_examples():
    assert convert("абстр+акцию") == "a0 b s t r a1 k c i0 j u0"
    assert convert("абстракцион+истов") == "a0 b s t r a0 k c i0 o0 nj i1 s t o0 v"
    assert convert("+ель") == "j e1 lj"


def test_g2p_matches_reference_random():
    rng = random.Random(7)
    for _ in range(3000):
        w = _random_word(rng)
        assert convert(w) == ref_g2p.convert(w), w


def test_symbol_maps_match_reference_tables():
    src = open("/root/reference/training/vits2/text/symbols.py").read()
    pmap = eval("{" + re.search(r"pmap = \{(.*?)\n\}", src, re.S).group(1) + "}")
    assert plain_symbol_map() == {k: v[0] for k, v in pmap.items()}

    src2 = open("/root/reference/training/stabletts/matcha/text/symbols.py").read()
    pmap2 = eval("{" + re.search(r"pmap = \{(.*?)\}", src2, re.S).group(1) + "}")
    assert multistream_symbol_map() == pmap2


TEXTS = [
    "Привет мир!",
    "Как дела, дорогой друг?",
    'Он сказал: "всё хорошо"... И ушёл.',
    "Это - тест; длинное предложение, с разными знаками!",
    "Слово",
    "Раз два три. Четыре пять!",
]


@pytest.mark.parametrize("text", TEXTS)
def test_g2p_noembed_matches(text):
    id_map = {k: [v] for k, v in plain_symbol_map().items()}
    fake = FakeModel(id_map)
    synth = ref_synth_mod.Synth(fake)
    want = synth.g2p_noembed(text)
    got = g2p_noembed(text, {}, id_map)
    assert got == want


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("blank", [True, False])
def test_g2p_plain_matches(text, blank):
    id_map = plain_symbol_map()
    fake = FakeModel(id_map)
    synth = ref_synth_mod.Synth(fake)
    emb = np.arange(64 * 3, dtype=np.float32).reshape(64, 3)
    if blank:
        want_ids, want_embs = synth.g2p(text, emb)
    else:
        want_ids, want_embs = synth.g2p_noblank(text, emb)
    got_ids, got_embs = g2p_plain(text, {}, id_map, emb, blank=blank)
    assert got_ids == want_ids
    np.testing.assert_array_equal(np.stack(got_embs), np.stack(want_embs))


@pytest.mark.parametrize("text", TEXTS + ["Пауза _ вот. И - тире вот..."])
@pytest.mark.parametrize("mode", ["v1", "v2", "v3"])
def test_g2p_multistream_matches(text, mode):
    # v1 models use unsuffixed phones; the union map serves both layouts
    id_map = {**{k: v + 500 for k, v in plain_symbol_map().items()}, **multistream_symbol_map()}
    fake = FakeModel(id_map)
    synth = ref_synth_mod.Synth(fake)
    emb = np.arange(64 * 3, dtype=np.float32).reshape(64, 3)
    if mode == "v2" and "_" in text:
        pytest.skip("'_' pause markers are a v1/v3-only input (v2 raises in the reference too)")
    if mode == "v1":
        want = synth.g2p_multistream(text, emb, word_pos=False)
        got = g2p_multistream(text, {}, id_map, emb, word_pos=False)
        assert [tuple(t) for t in got[0]] == [tuple(t) for t in want[0]]
        np.testing.assert_array_equal(np.stack(got[1]), np.stack(want[1]))
    elif mode == "v2":
        want = synth.g2p_multistream(text, emb, word_pos=True)
        got = g2p_multistream(text, {}, id_map, emb, word_pos=True)
        assert [tuple(t) for t in got[0]] == [tuple(t) for t in want[0]]
        np.testing.assert_array_equal(np.stack(got[1]), np.stack(want[1]))
    else:
        want = synth.g2p_multistream_scales(text, emb)
        got = g2p_multistream(text, {}, id_map, emb, word_pos=True, pause_markers=True)
        assert [tuple(t) for t in got[0]] == [tuple(t) for t in want[0]]
        np.testing.assert_array_equal(np.stack(got[1]), np.stack(want[1]))
        assert got[2] == want[2]


def test_dictionary_beats_g2p(tmp_path):
    d = tmp_path / "dictionary"
    d.write_text("привет 0.5 p rj i0 vj e1 t\nпривет 0.9 p r i0 v e1 t\n", encoding="utf-8")
    from vosk_tts_tpu.text import load_dictionary

    dic = load_dictionary(d)
    assert dic["привет"].split() == ["p", "r", "i0", "v", "e1", "t"]
    ids = g2p_noembed("привет", dic, {k: [v] for k, v in plain_symbol_map().items()})
    assert len(ids) > 0
