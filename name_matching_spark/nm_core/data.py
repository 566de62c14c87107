"""Built-in normalization data.

The reference engine ships CSV dictionaries of legal-entity suffixes
(455 rows), common-word abbreviations (775 rows) and a transliteration map
(/root/reference/name_matching/data/).  We do not copy those files; instead
we ship our own compact lists of well-known public facts (legal entity
forms, common corporate words, Latin transliterations) in the same *shape*,
and every loader accepts an external CSV path so a deployment can plug in a
larger dictionary.  The rule-expansion machinery in ``preprocess.py`` is
what defines the semantics; these lists are swappable data.
"""

from __future__ import annotations

import csv
from pathlib import Path

# 1 -> N transliterations not handled by NFD decomposition + combining-mark
# removal (which covers ordinary accents).  Applied after NFD.
TRANSLITERATION_MAP = {
    "æ": "ae", "Æ": "AE",
    "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O",
    "ß": "ss", "ẞ": "SS",
    "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH",
    "ł": "l", "Ł": "L",
    "ħ": "h", "Ħ": "H",
    "ı": "i", "İ": "I",
    "ĸ": "k",
    "ŋ": "ng", "Ŋ": "NG",
    "ŧ": "t", "Ŧ": "T",
    "ſ": "s",
    "ƒ": "f",
    "ǝ": "e", "Ə": "E",
    "ɨ": "i",
    "ʉ": "u",
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e",
    "и": "i", "й": "i", "к": "k", "с": "s", "о": "o", "а": "a", "е": "e",
}

# (abbreviation, full_name) pairs of well-known legal entity forms.
# Same shape as the reference's legal_names.csv (abbreviation,full_name).
LEGAL_FORMS = [
    ("b.v.", "besloten vennootschap"),
    ("n.v.", "naamloze vennootschap"),
    ("v.o.f.", "vennootschap onder firma"),
    ("c.v.", "commanditaire vennootschap"),
    ("gmbh", "gesellschaft mit beschränkter haftung"),
    ("ag", "aktiengesellschaft"),
    ("kg", "kommanditgesellschaft"),
    ("ohg", "offene handelsgesellschaft"),
    ("ug", "unternehmergesellschaft"),
    ("ltd", "limited"),
    ("plc", "public limited company"),
    ("llp", "limited liability partnership"),
    ("llc", "limited liability company"),
    ("inc", "incorporated"),
    ("corp", "corporation"),
    ("co", "company"),
    ("pty", "proprietary"),
    ("s.a.", "sociedad anónima"),
    ("s.a.", "société anonyme"),
    ("s.a.s.", "société par actions simplifiée"),
    ("s.a.r.l.", "société à responsabilité limitée"),
    ("s.r.l.", "sociedad de responsabilidad limitada"),
    ("s.r.l.", "società a responsabilità limitata"),
    ("s.p.a.", "società per azioni"),
    ("s.c.", "sociedad colectiva"),
    ("e.i.r.l.", "empresa individual de responsabilidad limitada"),
    ("lda", "limitada"),
    ("a.b.", "aktiebolag"),
    ("a.s.", "aksjeselskap"),
    ("a/s", "aktieselskab"),
    ("oy", "osakeyhtiö"),
    ("oyj", "julkinen osakeyhtiö"),
    ("a.s.", "anonim şirketi"),
    ("s.r.o.", "společnost s ručením omezeným"),
    ("sp. z o.o.", "spółka z ograniczoną odpowiedzialnością"),
    ("o.o.o.", "obshchestvo s ogranichennoy otvetstvennostyu"),
    ("z.a.o.", "zakrytoe aktsionernoe obshchestvo"),
    ("k.k.", "kabushiki kaisha"),
    ("g.k.", "godo kaisha"),
    ("pte", "private"),
    ("bhd", "berhad"),
    ("sdn", "sendirian"),
    ("p.t.", "perseroan terbatas"),
    ("e.v.", "eingetragener verein"),
    ("vzw", "vereniging zonder winstoogmerk"),
    ("a.s.b.l.", "association sans but lucratif"),
    ("coop", "cooperative"),
    ("cia", "compañía"),
    ("cie", "compagnie"),
    ("sh.a.", "shoqëri aksionare"),
    ("sh.p.k.", "shoqëri me përgjegjësi të kufizuar"),
]

# (word, short_form) pairs, reference common_words.csv shape; #xxx# short
# forms so abbreviated words can never collide with real words.
COMMON_WORDS = [
    ("holding", "#hld#"),
    ("holdings", "#hld#"),
    ("services", "#srv#"),
    ("service", "#srv#"),
    ("company", "#coo#"),
    ("co", "#coo#"),
    ("consulting", "#clt#"),
    ("management", "#mgt#"),
    ("international", "#int#"),
    ("group", "#grp#"),
    ("groep", "#grp#"),
    ("gruppe", "#grp#"),
    ("groupe", "#grp#"),
    ("industries", "#ind#"),
    ("industrial", "#ind#"),
    ("investments", "#inv#"),
    ("investment", "#inv#"),
    ("partners", "#prt#"),
    ("partner", "#prt#"),
    ("enterprises", "#ent#"),
    ("enterprise", "#ent#"),
    ("solutions", "#sol#"),
    ("solution", "#sol#"),
    ("technologies", "#tec#"),
    ("technology", "#tec#"),
    ("systems", "#sys#"),
    ("system", "#sys#"),
    ("global", "#glb#"),
    ("trading", "#trd#"),
    ("trade", "#trd#"),
    ("capital", "#cap#"),
    ("financial", "#fin#"),
    ("finance", "#fin#"),
    ("properties", "#prp#"),
    ("property", "#prp#"),
    ("development", "#dev#"),
    ("developments", "#dev#"),
    ("engineering", "#eng#"),
    ("logistics", "#log#"),
    ("construction", "#cst#"),
    ("communications", "#com#"),
    ("communication", "#com#"),
    ("associates", "#ass#"),
    ("association", "#ass#"),
    ("foundation", "#fnd#"),
    ("stichting", "#fnd#"),
    ("fondation", "#fnd#"),
    ("bank", "#bnk#"),
    ("banque", "#bnk#"),
    ("insurance", "#ins#"),
    ("verzekeringen", "#ins#"),
    ("pharmaceuticals", "#pha#"),
    ("pharma", "#pha#"),
]


def load_pairs_csv(path: str | Path, col_a: str, col_b: str) -> list[tuple[str, str]]:
    """Load (col_a, col_b) tuples from a CSV with a header row."""
    out = []
    with open(path, newline="", encoding="utf-8") as fh:
        for row in csv.DictReader(fh):
            out.append((row[col_a], row[col_b]))
    return out


def legal_forms(csv_path: str | Path | None = None) -> list[tuple[str, str]]:
    """(abbreviation, full_name) rules; external CSV overrides built-ins."""
    if csv_path:
        return load_pairs_csv(csv_path, "abbreviation", "full_name")
    return list(LEGAL_FORMS)


def common_words(csv_path: str | Path | None = None) -> list[tuple[str, str]]:
    """(word, short_form) rules; external CSV overrides built-ins."""
    if csv_path:
        return load_pairs_csv(csv_path, "word", "short_form")
    return list(COMMON_WORDS)
