"""Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000).

Implementation of the published algorithm (the rule set is the algorithm;
it is public and widely re-implemented).  Returns "primary,secondary" with
secondary blanked when equal to primary, matching the composition used by
the reference engine's phonetic distance (reference behaviour studied at
/root/reference/distances/_double_metaphone.py; code written fresh against
the published rules).

The encoder operates on the raw uppercased string (spaces retained -- the
"VAN ", "SAN " rules depend on them) padded with five trailing spaces.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("AEIOUY")


class _DM:
    """Single-use encoder state for one word."""

    __slots__ = ("w", "length", "last", "cur", "pri", "sec")

    def __init__(self, word: str):
        self.length = len(word)
        self.last = self.length - 1
        self.w = word.upper() + "     "
        self.cur = 0
        self.pri: list[str] = []
        self.sec: list[str] = []

    # -- helpers ----------------------------------------------------------
    def add(self, p: str, s: str | None = None) -> None:
        if p:
            self.pri.append(p)
        if s is None:
            self.sec.append(p)
        elif s != " ":
            self.sec.append(s)

    def vowel(self, pos: int) -> bool:
        return pos >= 0 and self.w[pos] in _VOWELS

    def at(self, pos: int) -> str:
        return self.w[pos] if pos >= 0 else ""

    def seg(self, pos: int, n: int, options) -> bool:
        return pos >= 0 and self.w[pos:pos + n] in options

    def slavo_germanic(self) -> bool:
        head = self.w[: self.length]
        return "W" in head or "K" in head or "CZ" in head

    # -- encoding ---------------------------------------------------------
    def encode(self) -> tuple[str, str]:
        if self.length < 1:
            return "", ""
        if self.w[0:2] in ("GN", "KN", "PN", "WR", "PS"):
            self.cur = 1
        if self.at(0) == "X":
            self.add("S")  # initial X sounds like Z -> S
            self.cur = 1

        handlers = {
            "B": self._b, "C": self._c, "Ç": self._cedilla, "D": self._d,
            "F": self._f, "G": self._g, "H": self._h, "J": self._j,
            "K": self._k, "L": self._l, "M": self._m, "N": self._n,
            "Ñ": self._enye, "P": self._p, "Q": self._q, "R": self._r,
            "S": self._s, "T": self._t, "V": self._v, "W": self._w,
            "X": self._x, "Z": self._z,
        }
        while self.cur < self.length:
            ch = self.at(self.cur)
            if ch in _VOWELS:
                if self.cur == 0:
                    self.add("A")
                self.cur += 1
            else:
                h = handlers.get(ch)
                if h:
                    h()
                else:
                    self.cur += 1
        return "".join(self.pri), "".join(self.sec)

    # -- per-letter rules (conditions follow the published algorithm) ------
    def _b(self):
        self.add("P")
        self.cur += 2 if self.at(self.cur + 1) == "B" else 1

    def _cedilla(self):
        self.add("S")
        self.cur += 1

    def _c(self):
        c = self.cur
        # germanic -ACH-
        if (c > 1 and not self.vowel(c - 2) and self.seg(c - 1, 3, ("ACH",))
                and (self.at(c + 2) != "I"
                     and (self.at(c + 2) != "E"
                          or self.seg(c - 2, 6, ("BACHER", "MACHER"))))):
            self.add("K")
            self.cur += 2
            return
        if c == 0 and self.seg(c, 6, ("CAESAR",)):
            self.add("S")
            self.cur += 2
            return
        if self.seg(c, 4, ("CHIA",)):  # chianti
            self.add("K")
            self.cur += 2
            return
        if self.seg(c, 2, ("CH",)):
            if c > 0 and self.seg(c, 4, ("CHAE",)):  # michael
                self.add("K", "X")
            elif (c == 0
                  and (self.seg(c + 1, 5, ("HARAC", "HARIS"))
                       or self.seg(c + 1, 3, ("HOR", "HYM", "HIA", "HEM")))
                  and not self.seg(0, 5, ("CHORE",))):
                self.add("K")  # greek roots
            elif ((self.seg(0, 4, ("VAN ", "VON "))
                   or self.seg(0, 3, ("SCH",)))
                  or self.seg(c - 2, 6, ("ORCHES", "ARCHIT", "ORCHID"))
                  or self.seg(c + 2, 1, ("T", "S"))
                  or ((self.seg(c - 1, 1, ("A", "O", "U", "E")) or c == 0)
                      and self.seg(c + 2, 1, ("L", "R", "N", "M", "B", "H",
                                              "F", "V", "W", " ")))):
                self.add("K")  # 'kh' sound
            elif c > 0:
                self.add("K" if self.seg(0, 2, ("MC",)) else "X",
                         None if self.seg(0, 2, ("MC",)) else "K")
            else:
                self.add("X")
            self.cur += 2
            return
        if self.seg(c, 2, ("CZ",)) and not self.seg(c - 2, 4, ("WICZ",)):
            self.add("S", "X")  # czerny
            self.cur += 2
            return
        if self.seg(c + 1, 3, ("CIA",)):  # focaccia
            self.add("X")
            self.cur += 3
            return
        if self.seg(c, 2, ("CC",)) and not (c == 1 and self.at(0) == "M"):
            if (self.seg(c + 2, 1, ("I", "E", "H"))
                    and not self.seg(c + 2, 2, ("HU",))):
                if ((c == 1 and self.at(c - 1) == "A")
                        or self.seg(c - 1, 5, ("UCCEE", "UCCES"))):
                    self.add("KS")  # accident / succeed
                else:
                    self.add("X")  # bacci
                self.cur += 3
            else:  # Pierce's rule
                self.add("K")
                self.cur += 2
            return
        if self.seg(c, 2, ("CK", "CG", "CQ")):
            self.add("K")
            self.cur += 2
            return
        if self.seg(c, 2, ("CI", "CE", "CY")):
            self.add("S", "X" if self.seg(c, 3, ("CIO", "CIE", "CIA"))
                     else None)
            self.cur += 2
            return
        self.add("K")
        if self.seg(c + 1, 2, (" C", " Q", " G")):  # mac caffrey
            self.cur += 3
        elif (self.seg(c + 1, 1, ("C", "K", "Q"))
                and not self.seg(c + 1, 2, ("CE", "CI"))):
            self.cur += 2
        else:
            self.cur += 1

    def _d(self):
        c = self.cur
        if self.seg(c, 2, ("DG",)):
            if self.seg(c + 2, 1, ("I", "E", "Y")):
                self.add("J")  # edge
                self.cur += 3
            else:
                self.add("TK")  # edgar
                self.cur += 2
        elif self.seg(c, 2, ("DT", "DD")):
            self.add("T")
            self.cur += 2
        else:
            self.add("T")
            self.cur += 1

    def _f(self):
        self.cur += 2 if self.at(self.cur + 1) == "F" else 1
        self.add("F")

    def _g(self):
        c = self.cur
        nxt = self.at(c + 1)
        if nxt == "H":
            if c > 0 and not self.vowel(c - 1):
                self.add("K")
                self.cur += 2
                return
            if c == 0:
                self.add("J" if self.at(c + 2) == "I" else "K")
                self.cur += 2
                return
            # Parker's rule: silent GH after B/H/D
            if ((c > 1 and self.seg(c - 2, 1, ("B", "H", "D")))
                    or (c > 2 and self.seg(c - 3, 1, ("B", "H", "D")))
                    or (c > 3 and self.seg(c - 4, 1, ("B", "H")))):
                self.cur += 2
                return
            if (c > 2 and self.at(c - 1) == "U"
                    and self.seg(c - 3, 1, ("C", "G", "L", "R", "T"))):
                self.add("F")  # laugh, rough
            elif c > 0 and self.at(c - 1) != "I":
                self.add("K")
            self.cur += 2
            return
        if nxt == "N":
            if c == 1 and self.vowel(0) and not self.slavo_germanic():
                self.add("KN", "N")
            elif (not self.seg(c + 2, 2, ("EY",)) and nxt != "Y"
                    and not self.slavo_germanic()):
                self.add("N", "KN")
            else:
                self.add("KN")
            self.cur += 2
            return
        if self.seg(c + 1, 2, ("LI",)) and not self.slavo_germanic():
            self.add("KL", "L")  # tagliaro
            self.cur += 2
            return
        if c == 0 and (nxt == "Y" or self.seg(c + 1, 2, (
                "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE",
                "EI", "ER"))):
            self.add("K", "J")  # ges-, gep-, gie- at start
            self.cur += 2
            return
        if ((self.seg(c + 1, 2, ("ER",)) or nxt == "Y")
                and not self.seg(0, 6, ("DANGER", "RANGER", "MANGER"))
                and not self.seg(c - 1, 1, ("E", "I"))
                and not self.seg(c - 1, 3, ("RGY", "OGY"))):
            self.add("K", "J")  # -ger-, -gy-
            self.cur += 2
            return
        if (self.seg(c + 1, 1, ("E", "I", "Y"))
                or self.seg(c - 1, 4, ("AGGI", "OGGI"))):
            if ((self.seg(0, 4, ("VAN ", "VON "))
                 or self.seg(0, 3, ("SCH",)))
                    or self.seg(c + 1, 2, ("ET",))):
                self.add("K")  # germanic
            elif self.seg(c + 1, 4, ("IER ",)):
                self.add("J")
            else:
                self.add("J", "K")
            self.cur += 2
            return
        self.cur += 2 if nxt == "G" else 1
        self.add("K")

    def _h(self):
        c = self.cur
        if (c == 0 or self.vowel(c - 1)) and self.vowel(c + 1):
            self.add("H")
            self.cur += 2
        else:
            self.cur += 1

    def _j(self):
        c = self.cur
        if self.seg(c, 4, ("JOSE",)) or self.seg(0, 4, ("SAN ",)):
            if ((c == 0 and self.at(c + 4) == " ")
                    or self.seg(0, 4, ("SAN ",))):
                self.add("H")
            else:
                self.add("J", "H")
            self.cur += 1
            return
        if c == 0 and not self.seg(c, 4, ("JOSE",)):
            self.add("J", "A")  # Yankelovich/Jankelowicz
        elif (self.vowel(c - 1) and not self.slavo_germanic()
                and self.at(c + 1) in ("A", "O")):
            self.add("J", "H")  # bajador
        elif c == self.last:
            self.add("J", " ")
        elif (not self.seg(c + 1, 1, ("L", "T", "K", "S", "N", "M", "B",
                                      "Z"))
                and not self.seg(c - 1, 1, ("S", "K", "L"))):
            self.add("J")
        self.cur += 2 if self.at(c + 1) == "J" else 1

    def _k(self):
        self.cur += 2 if self.at(self.cur + 1) == "K" else 1
        self.add("K")

    def _l(self):
        c = self.cur
        if self.at(c + 1) == "L":
            # spanish -illo/-alle
            if ((c == self.length - 3
                 and self.seg(c - 1, 4, ("ILLO", "ILLA", "ALLE")))
                    or ((self.seg(self.last - 1, 2, ("AS", "OS"))
                         or self.seg(self.last, 1, ("A", "O")))
                        and self.seg(c - 1, 4, ("ALLE",)))):
                self.add("L", " ")
                self.cur += 2
                return
            self.cur += 2
        else:
            self.cur += 1
        self.add("L")

    def _m(self):
        c = self.cur
        if ((self.seg(c - 1, 3, ("UMB",))
             and (c + 1 == self.last or self.seg(c + 2, 2, ("ER",))))
                or self.at(c + 1) == "M"):
            self.cur += 2
        else:
            self.cur += 1
        self.add("M")

    def _n(self):
        self.cur += 2 if self.at(self.cur + 1) == "N" else 1
        self.add("N")

    def _enye(self):
        self.cur += 1
        self.add("N")

    def _p(self):
        c = self.cur
        if self.at(c + 1) == "H":
            self.add("F")
            self.cur += 2
            return
        self.cur += 2 if self.seg(c + 1, 1, ("P", "B")) else 1
        self.add("P")

    def _q(self):
        self.cur += 2 if self.at(self.cur + 1) == "Q" else 1
        self.add("K")

    def _r(self):
        c = self.cur
        if (c == self.last and not self.slavo_germanic()
                and self.seg(c - 2, 2, ("IE",))
                and not self.seg(c - 4, 2, ("ME", "MA"))):
            self.add("", "R")  # french rogier
        else:
            self.add("R")
        self.cur += 2 if self.at(c + 1) == "R" else 1

    def _s(self):
        c = self.cur
        if self.seg(c - 1, 3, ("ISL", "YSL")):  # island, isle
            self.cur += 1
            return
        if c == 0 and self.seg(c, 5, ("SUGAR",)):
            self.add("X", "S")
            self.cur += 1
            return
        if self.seg(c, 2, ("SH",)):
            if self.seg(c + 1, 4, ("HEIM", "HOEK", "HOLM", "HOLZ")):
                self.add("S")
            else:
                self.add("X")
            self.cur += 2
            return
        if self.seg(c, 3, ("SIO", "SIA")) or self.seg(c, 4, ("SIAN",)):
            self.add("S", None if self.slavo_germanic() else "X")
            self.cur += 3
            return
        if ((c == 0 and self.seg(c + 1, 1, ("M", "N", "L", "W")))
                or self.seg(c + 1, 1, ("Z",))):
            self.add("S", "X")  # smith/schmidt, -sz-
            self.cur += 2 if self.seg(c + 1, 1, ("Z",)) else 1
            return
        if self.seg(c, 2, ("SC",)):
            if self.at(c + 2) == "H":
                if self.seg(c + 3, 2, ("OO", "ER", "EN", "UY", "ED", "EM")):
                    if self.seg(c + 3, 2, ("ER", "EN")):
                        self.add("X", "SK")  # schermerhorn
                    else:
                        self.add("SK")  # school
                else:
                    if c == 0 and not self.vowel(3) and self.at(3) != "W":
                        self.add("X", "S")
                    else:
                        self.add("X")
                self.cur += 3
                return
            if self.seg(c + 2, 1, ("I", "E", "Y")):
                self.add("S")
            else:
                self.add("SK")
            self.cur += 3
            return
        if c == self.last and self.seg(c - 2, 2, ("AI", "OI")):
            self.add("", "S")  # french resnais
        else:
            self.add("S")
        self.cur += 2 if self.seg(c + 1, 1, ("S", "Z")) else 1

    def _t(self):
        c = self.cur
        if self.seg(c, 4, ("TION",)):
            self.add("X")
            self.cur += 3
            return
        if self.seg(c, 3, ("TIA", "TCH")):
            self.add("X")
            self.cur += 3
            return
        if self.seg(c, 2, ("TH",)) or self.seg(c, 3, ("TTH",)):
            if (self.seg(c + 2, 2, ("OM", "AM"))
                    or self.seg(0, 4, ("VAN ", "VON "))
                    or self.seg(0, 3, ("SCH",))):
                self.add("T")  # thomas
            else:
                self.add("0", "T")
            self.cur += 2
            return
        self.cur += 2 if self.seg(c + 1, 1, ("T", "D")) else 1
        self.add("T")

    def _v(self):
        self.cur += 2 if self.at(self.cur + 1) == "V" else 1
        self.add("F")

    def _w(self):
        c = self.cur
        if self.seg(c, 2, ("WR",)):
            self.add("R")
            self.cur += 2
            return
        if c == 0 and (self.vowel(c + 1) or self.seg(c, 2, ("WH",))):
            if self.vowel(c + 1):
                self.add("A", "F")  # Wasserman ~ Vasserman
            else:
                self.add("A")  # Uomo ~ Womo
        if ((c == self.last and self.vowel(c - 1))
                or self.seg(c - 1, 5, ("EWSKI", "EWSKY", "OWSKI", "OWSKY"))
                or self.seg(0, 3, ("SCH",))):
            self.add("", "F")  # Arnow ~ Arnoff
            self.cur += 1
            return
        if self.seg(c, 4, ("WICZ", "WITZ")):
            self.add("TS", "FX")  # filipowicz
            self.cur += 4
            return
        self.cur += 1

    def _x(self):
        c = self.cur
        if not (c == self.last
                and (self.seg(c - 3, 3, ("IAU", "EAU"))
                     or self.seg(c - 2, 2, ("AU", "OU")))):
            self.add("KS")  # not french breaux
        self.cur += 2 if self.seg(c + 1, 1, ("C", "X")) else 1

    def _z(self):
        c = self.cur
        if self.at(c + 1) == "H":
            self.add("J")  # chinese zhao
            self.cur += 2
            return
        if (self.seg(c + 1, 2, ("ZO", "ZI", "ZA"))
                or (self.slavo_germanic()
                    and c > 0 and self.at(c - 1) != "T")):
            self.add("S", "TS")
        else:
            self.add("S")
        self.cur += 2 if self.at(c + 1) == "Z" else 1


@lru_cache(maxsize=65536)
def double_metaphone(word: str, max_length: int = -1) -> str:
    """-> 'primary,secondary' (secondary blank if equal to primary)."""
    if max_length != -1:
        max_length = max(4, max_length)
    pri, sec = _DM(word).encode()
    if max_length > 0:
        pri, sec = pri[:max_length], sec[:max_length]
    if pri == sec:
        sec = ""
    return f"{pri},{sec}"
