"""Porter2 (Snowball English) parity vs the reference's golden vocabulary
(``analysis/common/src/test/.../snowball/english.zip`` — 2000 word/stem
pairs shipped with the reference's own TestSnowballVocab)."""

import os
import zipfile

import pandas as pd
import pytest

from lucene_spark.analysis_porter2 import Porter2Analyzer, porter2_stem

_ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/snowball/english.zip")

INLINE = [
    # exceptional forms + algorithm spot checks (snowballstem.org examples)
    ("skies", "sky"), ("dying", "die"), ("news", "news"),
    ("consign", "consign"), ("consigned", "consign"),
    ("consolingly", "consol"), ("generate", "generat"),
    ("generically", "generic"), ("communities", "communiti"),
    ("knavishly", "knavish"), ("arsenic", "arsenic"),
    ("proceed", "proceed"), ("exceeding", "exceed"),
    ("tables", "tabl"), ("cry", "cri"), ("by", "by"),
    ("hopping", "hop"), ("hoping", "hope"), ("tanned", "tan"),
    ("falling", "fall"), ("knitting", "knit"),
]


@pytest.mark.parametrize("word,stem", INLINE)
def test_inline(word, stem):
    assert porter2_stem(word) == stem


def test_full_golden_vocabulary():
    if not os.path.exists(_ZIP):
        pytest.skip("reference tree not available")
    z = zipfile.ZipFile(_ZIP)
    voc = z.read("voc.txt").decode().split()
    out = z.read("output.txt").decode().split()
    bad = [(w, want, porter2_stem(w)) for w, want in zip(voc, out)
           if porter2_stem(w) != want]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_analyzer_paths():
    from lucene_spark.analysis import get_analyzer
    a = get_analyzer("porter2")
    assert isinstance(a, Porter2Analyzer)
    texts = pd.Series(["the tables were dying", "generically hopping", None])
    uniq, codes, per_row = a.tokenize_ids(texts)
    flat = [uniq[c] for c in codes]
    rows, i = [], 0
    for n in per_row:
        rows.append(flat[i:i + n])
        i += n
    assert rows == [a.tokenize_text(t or "") for t in texts]
    assert rows[0] == ["the", "tabl", "were", "die"]


_SNOWBALL = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
             "lucene/analysis/snowball")


def _replay_zip(zname, stem_fn):
    path = f"{_SNOWBALL}/{zname}"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    z = zipfile.ZipFile(path)
    voc = z.read("voc.txt").decode().split()
    out = z.read("output.txt").decode().split()
    return [(w, want, stem_fn(w)) for w, want in zip(voc, out)
            if stem_fn(w) != want]


def test_danish_full_golden():
    from lucene_spark.analysis_da import danish_stem
    bad = _replay_zip("danish.zip", danish_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_danish_registry():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_da import DanishAnalyzer
    assert isinstance(get_analyzer("danish"), DanishAnalyzer)


def test_core_porter1_vs_snowball_porter_golden():
    """Lucene-core PorterStemmer (our `english` chain) against the snowball
    'porter' golden: the ONLY divergences are the core implementation's
    documented departures (PorterStemmer.java header: the bli→ble /
    logi→log deviations and the ≤2-letter guard)."""
    from lucene_spark.analysis_en import porter_stem
    bad = _replay_zip("porter.zip", porter_stem)
    assert {(w, want, got) for w, want, got in bad} == {
        ("visibly", "visibli", "visibl"),   # bli → ble departure
        ("palynology", "palynologi", "palynolog"),  # logi → log departure
        ("rs", "r", "rs"),                  # ≤2-letter guard
        ("uy", "ui", "uy"),                 # ≤2-letter guard
    }


def test_dutch_full_golden():
    from lucene_spark.analysis_nl import dutch_stem
    bad = _replay_zip("dutch.zip", dutch_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_dutch_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_nl import DutchAnalyzer, dutch_stem
    assert isinstance(get_analyzer("dutch"), DutchAnalyzer)
    assert dutch_stem("overheid") == "over"      # R2 heid after the floor
    assert dutch_stem("adellijke") == "adel"     # e-ending then lijk
    assert dutch_stem("lichamelijk") == "licham"


def test_swedish_norwegian_snowball_goldens():
    from lucene_spark.analysis_da import (
        norwegian_snowball_stem,
        swedish_stem,
    )
    for zname, fn in (("swedish.zip", swedish_stem),
                      ("norwegian.zip", norwegian_snowball_stem)):
        bad = _replay_zip(zname, fn)
        assert not bad, f"{zname}: {len(bad)} mismatches, first: {bad[:5]}"


def test_snowball_scandinavian_registry():
    from lucene_spark.analysis import get_analyzer
    for name in ("swedish_snowball", "norwegian_snowball"):
        assert get_analyzer(name).name == name


def test_german_snowball_golden():
    from lucene_spark.analysis_de import german_snowball_stem
    bad = _replay_zip("german.zip", german_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_german_snowball_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_de import german_snowball_stem
    assert get_analyzer("german_snowball").name == "german_snowball"
    assert german_snowball_stem("engsten") == "engst"  # st needs ≥3 before
    assert german_snowball_stem("größe") == "gross"    # ß→ss + postlude
    assert german_snowball_stem("verhältnisse") == "verhaltnis"  # niss rule


def test_russian_snowball_golden():
    from lucene_spark.analysis_ru import russian_snowball_stem
    bad = _replay_zip("russian.zip", russian_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_russian_snowball_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_ru import russian_snowball_stem
    assert get_analyzer("russian_snowball").name == "russian_snowball"
    # ешь is an а/я-context verb suffix: without the context only ь strips
    assert russian_snowball_stem("выйдешь") == "выйдеш"
    assert russian_snowball_stem("читаешь") == "чита"


def test_spanish_snowball_golden():
    from lucene_spark.analysis_es import spanish_snowball_stem
    bad = _replay_zip("spanish.zip", spanish_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_spanish_snowball_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_es import spanish_snowball_stem
    assert get_analyzer("spanish_snowball").name == "spanish_snowball"
    # golden-verified: logía→log, osa→R2 delete, RV-blocked pronoun
    assert spanish_snowball_stem("astrología") == "astrolog"
    assert spanish_snowball_stem("dolorosa") == "dolor"
    assert spanish_snowball_stem("dárselo") == "darsel"


def test_italian_snowball_golden():
    from lucene_spark.analysis_it import italian_snowball_stem
    bad = _replay_zip("italian.zip", italian_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_italian_snowball_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_it import italian_snowball_stem
    assert get_analyzer("italian_snowball").name == "italian_snowball"
    # RV blocks the c/g+h strip on short stems; logia→log
    assert italian_snowball_stem("fughe") == "fugh"
    assert italian_snowball_stem("biologia") == "biolog"


def test_portuguese_snowball_golden():
    from lucene_spark.analysis_pt import portuguese_snowball_stem
    bad = _replay_zip("portuguese.zip", portuguese_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_portuguese_snowball_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_pt import portuguese_snowball_stem
    assert get_analyzer("portuguese_snowball").name == "portuguese_snowball"
    # nasal marking round-trip and the logia rewrite
    assert portuguese_snowball_stem("corações") == "coraçõ"
    assert portuguese_snowball_stem("biologia") == "biolog"


def test_german2_snowball_golden():
    from lucene_spark.analysis_de import german2_snowball_stem
    bad = _replay_zip("german2.zip", german2_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_german2_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_de import german2_snowball_stem
    assert get_analyzer("german2_snowball").name == "german2_snowball"
    # ae/oe/ue fold to umlauts (then postlude-unfold); qu and marked U exempt
    assert german2_snowball_stem("quelle") == "quell"
    assert german2_snowball_stem("bauer") == "bau"


def test_irish_golden():
    from lucene_spark.analysis_ga import irish_stem
    bad = _replay_zip("irish.zip", irish_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_irish_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_ga import irish_stem
    assert get_analyzer("irish").name == "irish"
    # eclipsis/lenition restoration: bhf→f, gc→c
    assert irish_stem("bhfeidhm") == "feidhm"
    assert irish_stem("gcarr") == "carr"


def test_hungarian_snowball_golden():
    from lucene_spark.analysis_hu import hungarian_snowball_stem
    bad = _replay_zip("hungarian.zip", hungarian_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_hungarian_snowball_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_hu import hungarian_snowball_stem
    assert get_analyzer("hungarian_snowball").name == "hungarian_snowball"
    # instrumental with undoubling; vowel-start R1 counts digraphs as one
    assert hungarian_snowball_stem("dobbal") == "dob"


def test_finnish_snowball_golden():
    from lucene_spark.analysis_fi import finnish_snowball_stem
    bad = _replay_zip("finnish.zip", finnish_snowball_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_finnish_snowball_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_fi import finnish_snowball_stem
    assert get_analyzer("finnish_snowball").name == "finnish_snowball"
    # among-routine fallback: seen's LONG fails → n + AEI tidy
    assert finnish_snowball_stem("ajaakseen") == "ajaaks"
    # tidy rules are fully R1-confined
    assert finnish_snowball_stem("aula") == "aula"
    assert finnish_snowball_stem("eräällä") == "erä"


def test_romanian_golden():
    from lucene_spark.analysis_ro import romanian_stem
    bad = _replay_zip("romanian.zip", romanian_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_romanian_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_ro import romanian_stem
    assert get_analyzer("romanian").name == "romanian"
    assert romanian_stem("abilităţi") == "abil"  # combo abilităţi→abil


def test_nepali_golden():
    from lucene_spark.analysis_ne import nepali_stem
    bad = _replay_zip("nepali.zip", nepali_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_nepali_registry():
    from lucene_spark.analysis import get_analyzer
    assert get_analyzer("nepali").name == "nepali"


def test_lovins_golden():
    from lucene_spark.analysis_lovins import lovins_stem
    bad = _replay_zip("lovins.zip", lovins_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_lovins_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_lovins import lovins_stem
    assert get_analyzer("lovins").name == "lovins"
    # the famous one-pass longest-match + respell behavior
    assert lovins_stem("nationally") == "nat"  # ionally removed
    assert lovins_stem("induction") == "induc"   # uct → uc respell
    assert lovins_stem("believe") == "belief"    # iev → ief respell


def test_kp_golden():
    from lucene_spark.analysis_kp import kp_stem
    bad = _replay_zip("kp.zip", kp_stem)
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_kp_inline():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis_kp import kp_stem
    assert get_analyzer("kp").name == "kp"
    # vowel lengthening with its golden-caught abort contexts
    assert kp_stem("bunkeren") == "bunker"      # abort: [cons][AOU-2-back]
    assert kp_stem("technologies") == "technoloog"  # lengthen past insert
    assert kp_stem("jetje") == "jet"            # je branch fall-through
