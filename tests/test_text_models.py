"""Language-ID model quality: the trigram profile model must beat the
stopword baseline on a corpus with REAL per-language textual signal.

(The driver's documents table cannot serve here: its lang labels are
text-independent — all five languages draw from one shared vocabulary —
so every classifier degenerates to the majority class on it. This corpus
uses real sample sentences per language, deterministically recombined.)"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from identity_matching_spark.queries import lang_id_stopword, lang_id_trigram

SENTENCES = {
    "en": "the quick brown fox jumps over the lazy dog and runs through "
          "the green fields with great joy every morning while the sun "
          "rises slowly over the quiet hills of the countryside",
    "de": "der schnelle braune fuchs springt über den faulen hund und "
          "läuft durch die grünen felder mit großer freude jeden morgen "
          "während die sonne langsam über den stillen hügeln aufgeht",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y corre "
          "por los campos verdes con gran alegría cada mañana mientras "
          "el sol sale despacio sobre las colinas tranquilas del campo",
    "fr": "le rapide renard brun saute par dessus le chien paresseux et "
          "court à travers les champs verts avec une grande joie chaque "
          "matin pendant que le soleil se lève lentement sur les collines",
    "zh": "kuai su de zong se hu li tiao guo lan duo de gou mei tian zao "
          "shang huan kuai de pao guo lü se de tian ye dang tai yang man "
          "man sheng qi zai an jing de shan po shang mian",
}
DOCS_PER_LANG = 40


def _corpus(spark):
    rows = []
    doc_id = 0
    for lang, sent in SENTENCES.items():
        words = sent.split()
        for i in range(DOCS_PER_LANG):
            # deterministic recombination: rotating 12-word windows
            start = (i * 7) % len(words)
            text = " ".join(words[start:] + words[:start])[: 80 + (i % 40)]
            rows.append((doc_id, lang, text))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _accuracy(df):
    held_out = [r for r in df.collect() if r["doc_id"] % 5 != 0]
    return sum(r["lang"] == r["pred_lang"] for r in held_out) / len(held_out)


def test_trigram_beats_stopword_baseline(spark):
    d = _corpus(spark)
    acc_tri = _accuracy(lang_id_trigram(d))
    acc_stop = _accuracy(lang_id_stopword(d))
    assert acc_tri > acc_stop, (acc_tri, acc_stop)
    assert acc_tri >= 0.9, acc_tri
