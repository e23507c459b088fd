"""Paice-Husk (Lancaster) stemmer — parity with the reference's
``whoosh.lang.paicehusk`` (/root/reference/src/whoosh/lang/paicehusk.py).

The default rule table is the published Paice/Husk rule set (data; same
string as the reference ships). The engine is an independent
re-expression.

Reference quirks (diff-tested in tests/test_paicehusk.py):
- its ``first_vowel`` does ``min([])`` and CRASHES (ValueError) on any
  stem with no a/e/i/o/u — e.g. ``stem("crying")`` — even though
  Paice-Husk treats a non-initial ``y`` as a vowel. We implement the
  documented semantics (a non-initial y counts when no earlier aeiou
  exists); a test asserts the reference bug.
- num=0 "protect" rules (``s0.``, ``nee0.``, …) slice ``stem[:0 - 0]`` and
  return the EMPTY string instead of protecting (``stem("bus") == ""``);
  ``stem[:-num]`` here reproduces that behavior bit-for-bit, so the two
  engines stay diff-identical. Real Paice-Husk would keep the word.
"""

from __future__ import annotations

import re

_RULE = re.compile(r"^(\w+)([*]?)(\d+)(\w*)([.>])")

_PREFIXES = ("kilo", "micro", "milli", "intra", "ultra", "mega",
             "nano", "pico", "pseudo")


class PaiceHuskStemmer:
    """Rule-table stemmer; pass a custom table string (rules separated by
    newlines, reversed-ending notation) or use the module ``stem()``."""

    def __init__(self, ruletable: str):
        self.rules: dict[str, list] = {}
        for line in ruletable.split("\n"):
            line = line.strip()
            if not line:
                continue
            m = _RULE.match(line)
            if not m:
                raise ValueError(f"bad Paice-Husk rule: {line!r}")
            ending = m.group(1)[::-1]
            rule = (ending, m.group(2) == "*", int(m.group(3)),
                    m.group(4), m.group(5) == ">")
            self.rules.setdefault(ending[-1], []).append(rule)

    @staticmethod
    def _first_vowel(word: str) -> int:
        """Position of the first vowel; a non-initial y counts when it
        precedes every aeiou (safe where the reference min([])-crashes)."""
        vps = [p for p in (word.find(v) for v in "aeiou") if p > -1]
        vp = min(vps) if vps else len(word)
        yp = word.find("y")
        if 0 < yp < vp:
            return yp
        return vp if vps else len(word)

    def stem(self, word: str) -> str:
        m = re.match(r"^\w+", word)
        if not m:
            return word
        stem = m.group(0)
        for prefix in _PREFIXES:
            if stem.startswith(prefix):
                stem = stem[len(prefix):]
                break
        is_intact = True
        continuing = True
        while continuing:
            pfv = self._first_vowel(stem)
            rulelist = self.rules.get(stem[-1:])
            if not rulelist:
                break
            continuing = False
            for ending, intact, num, append, cont in rulelist:
                if not stem.endswith(ending):
                    continue
                if intact and not is_intact:
                    continue
                newlen = len(stem) - num + len(append)
                # vowel-initial stems may shrink to 2 chars, others to 3
                if (pfv == 0 and newlen < 2) or (pfv > 0 and newlen < 3):
                    continue
                is_intact = False
                stem = stem[:-num] + append
                continuing = cont
                break
        return stem


# The published default Paice-Husk rule table (identical data to the
# reference's `defaultrules`, lang/paicehusk.py:120-237)
defaultrules = """\
ai*2.     { -ia > -   if intact }
a*1.      { -a > -    if intact }
bb1.      { -bb > -b   }
city3s.   { -ytic > -ys }
ci2>      { -ic > -    }
cn1t>     { -nc > -nt  }
dd1.      { -dd > -d   }
dei3y>    { -ied > -y  }
deec2ss.  { -ceed > -cess }
dee1.     { -eed > -ee }
de2>      { -ed > -    }
dooh4>    { -hood > -  }
e1>       { -e > -     }
feil1v.   { -lief > -liev }
fi2>      { -if > -    }
gni3>     { -ing > -   }
gai3y.    { -iag > -y  }
ga2>      { -ag > -    }
gg1.      { -gg > -g   }
ht*2.     { -th > -   if intact }
hsiug5ct. { -guish > -ct }
hsi3>     { -ish > -   }
i*1.      { -i > -    if intact }
i1y>      { -i > -y    }
ji1d.     { -ij > -id   --  see nois4j> & vis3j> }
juf1s.    { -fuj > -fus }
ju1d.     { -uj > -ud  }
jo1d.     { -oj > -od  }
jeh1r.    { -hej > -her }
jrev1t.   { -verj > -vert }
jsim2t.   { -misj > -mit }
jn1d.     { -nj > -nd  }
j1s.      { -j > -s    }
lbaifi6.  { -ifiabl > - }
lbai4y.   { -iabl > -y }
lba3>     { -abl > -   }
lbi3.     { -ibl > -   }
lib2l>    { -bil > -bl }
lc1.      { -cl > c    }
lufi4y.   { -iful > -y }
luf3>     { -ful > -   }
lu2.      { -ul > -    }
lai3>     { -ial > -   }
lau3>     { -ual > -   }
la2>      { -al > -    }
ll1.      { -ll > -l   }
mui3.     { -ium > -   }
mu*2.     { -um > -   if intact }
msi3>     { -ism > -   }
mm1.      { -mm > -m   }
nois4j>   { -sion > -j }
noix4ct.  { -xion > -ct }
noi3>     { -ion > -   }
nai3>     { -ian > -   }
na2>      { -an > -    }
nee0.     { protect  -een }
ne2>      { -en > -    }
nn1.      { -nn > -n   }
pihs4>    { -ship > -  }
pp1.      { -pp > -p   }
re2>      { -er > -    }
rae0.     { protect  -ear }
ra2.      { -ar > -    }
ro2>      { -or > -    }
ru2>      { -ur > -    }
rr1.      { -rr > -r   }
rt1>      { -tr > -t   }
rei3y>    { -ier > -y  }
sei3y>    { -ies > -y  }
sis2.     { -sis > -s  }
si2>      { -is > -    }
ssen4>    { -ness > -  }
ss0.      { protect  -ss }
suo3>     { -ous > -   }
su*2.     { -us > -   if intact }
s*1>      { -s > -    if intact }
s0.       { -s > -s    }
tacilp4y. { -plicat > -ply }
ta2>      { -at > -    }
tnem4>    { -ment > -  }
tne3>     { -ent > -   }
tna3>     { -ant > -   }
tpir2b.   { -ript > -rib }
tpro2b.   { -orpt > -orb }
tcud1.    { -duct > -duc }
tpmus2.   { -sumpt > -sum }
tpec2iv.  { -cept > -ceiv }
tulo2v.   { -olut > -olv }
tsis0.    { protect  -sist }
tsi3>     { -ist > -   }
tt1.      { -tt > -t   }
uqi3.     { -iqu > -   }
ugo1.     { -ogu > -og }
vis3j>    { -siv > -j  }
vie0.     { protect  -eiv }
vi2>      { -iv > -    }
ylb1>     { -bly > -bl }
yli3y>    { -ily > -y  }
ylp0.     { protect  -ply }
yl2>      { -ly > -    }
ygo1.     { -ogy > -og }
yhp1.     { -phy > -ph }
ymo1.     { -omy > -om }
ypo1.     { -opy > -op }
yti3>     { -ity > -   }
yte3>     { -ety > -   }
ytl2.     { -lty > -l  }
yrtsi5.   { -istry > - }
yra3>     { -ary > -   }
yro3>     { -ory > -   }
yfi3.     { -ify > -   }
ycn2t>    { -ncy > -nt }
yca3>     { -acy > -   }
zi2>      { -iz > -    }
zy1s.     { -yz > -ys  }
"""

_default = PaiceHuskStemmer(defaultrules)


def stem(word: str) -> str:
    """Stem ``word`` with the default Paice-Husk rules."""
    return _default.stem(word)
