"""Language-model sets and class-based LMs (src/lm/ngram_model_set.c).

-lmctl file format: one "path name [{ class ... }]" per line, with an
optional leading "{ probdef ... }" naming class-definition files.
The probdef format defines LMCLASS blocks mapping member words to class
words with in-class probabilities; a class-based LM scores
P(member | hist) = P(class | hist) * P(member | class).
"""

from __future__ import annotations

import math
import os
import re

from .ngram import NgramModel, read_lm, LN_BASE


class ClassDef:
    def __init__(self, name: str):
        self.name = name
        self.members: dict[str, float] = {}   # member word -> probability


def read_probdef(path: str) -> dict[str, ClassDef]:
    """Parse an LMCLASS probability-definition file."""
    classes: dict[str, ClassDef] = {}
    cur: ClassDef | None = None
    for raw in open(path):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("LMCLASS"):
            cur = ClassDef(line.split()[1])
            classes[cur.name] = cur
        elif line.startswith("END"):
            cur = None
        elif cur is not None:
            parts = line.split()
            word_class = parts[0]
            prob = float(parts[1]) if len(parts) > 1 else \
                1.0 / max(len(cur.members) + 1, 1)
            word = word_class.split(":")[0]
            cur.members[word] = prob
    return classes


class ClassNgramModel:
    """Wraps an NgramModel with word classes: class members score as
    P(class|hist) + log P(member|class) (ngram_model_set probdefs)."""

    def __init__(self, base: NgramModel, classes: dict[str, ClassDef]):
        self.base = base
        self.order = base.order
        self.counts = base.counts
        self.member_map: dict[str, tuple[int, float]] = {}
        for cd in classes.values():
            cwid = base.wid(cd.name)
            if cwid < 0:
                continue
            for member, prob in cd.members.items():
                self.member_map[member] = (
                    cwid, math.log(max(prob, 1e-12)) / LN_BASE)

    def wid(self, word: str) -> int:
        if word in self.member_map:
            return self.member_map[word][0]
        return self.base.wid(word)

    def raw_score(self, wid, hist, member: str | None = None):
        s = self.base.raw_score(wid, hist)
        if member is not None and member in self.member_map:
            s += self.member_map[member][1]
        return s

    def score_word(self, word: str, hist) -> float:
        if word in self.member_map:
            cwid, inprob = self.member_map[word]
            return self.base.raw_score(cwid, hist) + inprob
        w = self.base.wid(word)
        if w < 0:
            return float("-inf")
        return self.base.raw_score(w, hist)

    def __getattr__(self, name):
        return getattr(self.base, name)


class NgramModelSet:
    """Named collection of LMs with one active (ngram_model_set):
    supports -lmctl/-lmname and runtime switching."""

    def __init__(self, lw: float = 1.0, wip: float = 1.0):
        self.models: dict[str, NgramModel | ClassNgramModel] = {}
        self.active: str | None = None
        self.lw = lw
        self.wip = wip

    @classmethod
    def read_lmctl(cls, path: str, lw: float = 1.0,
                   wip: float = 1.0) -> "NgramModelSet":
        ms = cls(lw, wip)
        base_dir = os.path.dirname(os.path.abspath(path))
        text = open(path).read()
        toks = re.findall(r"\{[^}]*\}|\S+", text)
        probdefs: dict[str, ClassDef] = {}
        i = 0
        # optional leading { probdef files }
        if toks and toks[0].startswith("{"):
            for pd in toks[0].strip("{} \n").split():
                pd_path = os.path.join(base_dir, pd)
                if os.path.isfile(pd_path):
                    probdefs.update(read_probdef(pd_path))
            i = 1
        while i < len(toks):
            lm_file = toks[i]
            i += 1
            if i >= len(toks):
                break
            name = toks[i]
            i += 1
            class_names: list[str] = []
            if i < len(toks) and toks[i].startswith("{"):
                class_names = toks[i].strip("{} \n").split()
                i += 1
            lm_path = os.path.join(base_dir, lm_file)
            if not os.path.isfile(lm_path):
                continue
            m = read_lm(lm_path, lw=lw, wip=wip)
            if class_names:
                use = {n: probdefs[n] for n in class_names if n in probdefs}
                m = ClassNgramModel(m, use)
            ms.models[name] = m
            if ms.active is None:
                ms.active = name
        return ms

    def add(self, name: str, model):
        self.models[name] = model
        if self.active is None:
            self.active = name

    def select(self, name: str):
        if name not in self.models:
            raise KeyError(f"No LM named {name!r}")
        self.active = name
        return self.models[name]

    def current(self):
        return self.models[self.active] if self.active else None

    def __iter__(self):
        return iter(self.models)

    def __len__(self):
        return len(self.models)
