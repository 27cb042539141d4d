"""Word lattices: DAG construction, best-path rescoring, posteriors,
A* N-best (src/ps_lattice.c re-design).

The lattice is built from the flat decoder's dense per-frame records
(the backpointer-table equivalent): every plausible word exit (t, w)
becomes a node keyed (word, start frame); links connect nodes whose
spans abut, carrying the pred-independent segment acoustic score that
the decoder's ENTV channel makes exact.  On this DAG:

  * bestpath:  forward link DP with LM rescoring at bestpathlw/lw ratio
               (ps_lattice_bestpath, src/ps_lattice.c:1216-1440)
  * posterior: forward-backward alpha/beta over links with 1/ascale
               acoustic scaling (ps_lattice_posterior :1448-1524)
  * nbest:     A* over links with best-remaining-score heuristic
               (ps_astar_* :1714-1850)
  * write_htk: HTK SLF output (ps_lattice_write_htk :271)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

SHIFT = 1 << 10
NEG_INF = -1e30
LN_BASE_SHIFTED = math.log(1.0001) * SHIFT  # nats per shifted unit


@dataclass
class LatNode:
    word: str           # word string (with alt suffix)
    base: str           # base word (for LM)
    sf: int             # start frame
    is_fill: bool
    id: int = -1
    entries: list = field(default_factory=list)   # incoming link ids
    exits: list = field(default_factory=list)     # outgoing link ids


@dataclass
class LatLink:
    src: int            # node id
    dst: int
    ef: int             # end frame of src's word (dst.sf - 1)
    ascr: float         # segment acoustic score (shifted units)
    lscr: float = 0.0   # LM score filled by bestpath
    alpha: float = NEG_INF
    beta: float = NEG_INF
    post: float = NEG_INF


class Lattice:
    def __init__(self, frate: int = 100):
        self.nodes: list[LatNode] = []
        self.links: list[LatLink] = []
        self.start: int = -1
        self.end: int = -1
        self.frate = frate
        self.n_frames = 0
        self.norm = NEG_INF

    # -- construction --------------------------------------------------------

    @classmethod
    def from_flat_records(cls, dec, beam: float = 1e-5,
                          records=None) -> "Lattice":
        """Build from an NgramFlatDecoder/FsgDecoder after decode():
        records = (escore, estf, eprw, eascr, ...).  Pass `records`
        explicitly for batch decodes (decode_batch keeps one tuple per
        utterance in dec.batch_records)."""
        if records is None:
            records = dec.records
        escore, estf, eprw, eascr = (np.asarray(r)
                                     for r in records[:4])
        T, W = escore.shape
        lat = cls()
        lat.n_frames = T
        thresh = math.log(beam) / LN_BASE_SHIFTED  # shifted units (<0)
        d = dec.dict
        words = dec.words
        # plausible exits: valid and within `thresh` of the frame's best.
        # The O(T x W) scan + link enumeration runs natively when the C
        # extension is available (native/ps_native.c), else in Python.
        ends: list[list[tuple[int, float]]] = [[] for _ in range(T)]
        try:
            from .. import ps_native
            nk, lk, la = ps_native.lattice_scan(
                np.ascontiguousarray(escore, np.float32),
                np.ascontiguousarray(estf, np.int32),
                np.ascontiguousarray(eascr, np.float32), float(thresh))
            node_arr = np.frombuffer(nk, np.int64).reshape(-1, 2)
            link_arr = np.frombuffer(lk, np.int64).reshape(-1, 3)
            la = np.frombuffer(la, np.float32)
            for w, sf in node_arr:
                wid = words[int(w)]
                lat.nodes.append(LatNode(
                    word=d.wordstr(wid), base=d.basestr(wid), sf=int(sf),
                    is_fill=d.is_filler(wid), id=len(lat.nodes)))
            for li in range(len(link_arr)):
                src, dst, ef = (int(x) for x in link_arr[li])
                link = LatLink(src=src, dst=dst, ef=ef, ascr=float(la[li]))
                lid = len(lat.links)
                lat.links.append(link)
                lat.nodes[src].exits.append(lid)
                lat.nodes[dst].entries.append(lid)
            # final-frame exits for the terminal pass below
            node_of = {(int(w), int(sf)): i
                       for i, (w, sf) in enumerate(node_arr)}
            best_per_frame = escore.max(axis=1, keepdims=True)
            ok = (escore >= best_per_frame + thresh) & \
                (escore > NEG_INF / 2)
            for w in np.nonzero(ok[T - 1])[0]:
                sf = int(estf[T - 1, w])
                nid = node_of.get((int(w), sf))
                if nid is not None:
                    ends[T - 1].append((nid, float(eascr[T - 1, w])))
        except ImportError:
            best_per_frame = escore.max(axis=1, keepdims=True)
            ok = (escore >= best_per_frame + thresh) & \
                (escore > NEG_INF / 2)
            node_of = {}

            def get_node(w: int, sf: int) -> int:
                key = (w, sf)
                if key not in node_of:
                    wid = words[w]
                    n = LatNode(word=d.wordstr(wid), base=d.basestr(wid),
                                sf=sf, is_fill=d.is_filler(wid),
                                id=len(lat.nodes))
                    lat.nodes.append(n)
                    node_of[key] = n.id
                return node_of[key]

            for t in range(T):
                for w in np.nonzero(ok[t])[0]:
                    sf = int(estf[t, w])
                    if sf > t:
                        continue
                    nid = get_node(int(w), sf)
                    ends[t].append((nid, float(eascr[t, w])))
            starts: dict[int, list[int]] = {}
            for nid, n in enumerate(lat.nodes):
                starts.setdefault(n.sf, []).append(nid)
            for t in range(T - 1):
                for nid, ascr in ends[t]:
                    for dst in starts.get(t + 1, ()):
                        link = LatLink(src=nid, dst=dst, ef=t, ascr=ascr)
                        lid = len(lat.links)
                        lat.links.append(link)
                        lat.nodes[nid].exits.append(lid)
                        lat.nodes[dst].entries.append(lid)
        # start node: the decoder's start word instance at frame 0 if
        # present, else any node at sf == 0
        start_word = None
        if getattr(dec, "start_idx", None) is not None:
            start_word = d.wordstr(words[dec.start_idx])
        for nid, n in enumerate(lat.nodes):
            if n.sf == 0 and (start_word is None or n.word == start_word):
                lat.start = nid
                break
        if lat.start < 0:
            for nid, n in enumerate(lat.nodes):
                if n.sf == 0:
                    lat.start = nid
                    break
        # end node: best exit at final frame; add a terminal node
        term = LatNode(word="", base="", sf=T, is_fill=True,
                       id=len(lat.nodes))
        lat.nodes.append(term)
        lat.end = term.id
        for nid, ascr in ends[T - 1]:
            lid = len(lat.links)
            lat.links.append(LatLink(src=nid, dst=term.id, ef=T - 1,
                                     ascr=ascr))
            lat.nodes[nid].exits.append(lid)
            term.entries.append(lid)
        return lat

    @property
    def n_nodes(self):
        return len(self.nodes)

    @property
    def n_links(self):
        return len(self.links)

    # -- traversal order -----------------------------------------------------

    def _topo_links(self) -> list[int]:
        """Links ordered by end frame (a topological order since every
        link spans forward in time)."""
        return sorted(range(len(self.links)),
                      key=lambda i: self.links[i].ef)

    # -- bestpath (3rd pass) -------------------------------------------------

    def bestpath(self, lm=None, lwf: float = 1.0, silpen: float = 0.0,
                 fillpen: float = 0.0, finish_word: str | None = None):
        """Forward DP over links maximizing ascr + lwf * LM(word | hist),
        fillers bypassed for LM context (ps_lattice_bestpath).  Returns
        (best hyp string, list of (word, sf, ef), best score)."""
        order = self._topo_links()
        score = np.full(len(self.links), NEG_INF)
        back = np.full(len(self.links), -1, dtype=np.int64)

        def lm_score(hist_base: str | None, node: LatNode) -> float:
            if node.is_fill or lm is None:
                return silpen if node.word == "<sil>" else fillpen
            h = lm.wid(hist_base) if hist_base else -1
            w = lm.wid(node.base)
            if w < 0:
                return fillpen
            return lm.score(w, [h] if h >= 0 else []) / SHIFT * lwf

        # incoming LM history for a link = base word of its src node
        for li in order:
            l = self.links[li]
            src, dst = self.nodes[l.src], self.nodes[l.dst]
            if l.src == self.start:
                prev = l.ascr + lm_score(None, src)
                if prev > score[li]:
                    score[li] = prev
                    back[li] = -1
            for pi in src.entries:
                p = self.links[pi]
                if score[pi] <= NEG_INF / 2:
                    continue
                # LM context: predecessor's real-word chain
                hist = self.nodes[p.src].base \
                    if not self.nodes[p.src].is_fill else None
                cand = score[pi] + l.ascr + lm_score(hist, src)
                if cand > score[li]:
                    score[li] = cand
                    back[li] = pi
        # best terminal link; like ngram_search's find_exit, a final
        # </s> instance is preferred when one survives
        term_links = [li for li, l in enumerate(self.links)
                      if l.dst == self.end]
        if not term_links:
            return "", [], NEG_INF
        if finish_word is not None:
            fin = [li for li in term_links
                   if self.nodes[self.links[li].src].word == finish_word
                   and score[li] > NEG_INF / 2]
            if fin:
                term_links = fin
        best = max(term_links, key=lambda li: score[li])
        chain = []
        li = best
        while li >= 0:
            chain.append(li)
            li = int(back[li])
        chain.reverse()
        segs = []
        for li in chain:
            l = self.links[li]
            n = self.nodes[l.src]
            segs.append((n.word, n.sf, l.ef))
        hyp = " ".join(self.nodes[self.links[li].src].base for li in chain
                       if not self.nodes[self.links[li].src].is_fill)
        return hyp, segs, float(score[best])

    # -- posteriors ----------------------------------------------------------

    def posterior(self, ascale: float = 20.0):
        """Forward-backward over links; sets link.post (log posterior,
        nats) and returns the normalizer.  Acoustic scores scaled by
        1/ascale like ps_lattice_posterior."""
        order = self._topo_links()
        sc = LN_BASE_SHIFTED / ascale   # shifted units -> scaled nats

        def lse(a, b):
            if a <= NEG_INF / 2:
                return b
            if b <= NEG_INF / 2:
                return a
            m = max(a, b)
            return m + math.log1p(math.exp(min(a, b) - m))

        for li in order:
            l = self.links[li]
            a = l.ascr * sc
            if l.src == self.start:
                l.alpha = a
            total = NEG_INF
            for pi in self.nodes[l.src].entries:
                total = lse(total, self.links[pi].alpha)
            if total > NEG_INF / 2:
                l.alpha = lse(l.alpha if l.src == self.start else NEG_INF,
                              total + a)
        for li in reversed(order):
            l = self.links[li]
            if l.dst == self.end:
                l.beta = 0.0
            total = NEG_INF
            for ni in self.nodes[l.dst].exits:
                nl = self.links[ni]
                total = lse(total, nl.beta + nl.ascr * sc)
            if total > NEG_INF / 2:
                l.beta = lse(l.beta if l.dst == self.end else NEG_INF,
                             total)
        norm = NEG_INF
        for li, l in enumerate(self.links):
            if l.dst == self.end:
                norm = lse(norm, l.alpha + l.beta)
        self.norm = norm
        for l in self.links:
            l.post = l.alpha + l.beta - norm
        return norm

    def link_posterior(self, word: str, sf: int, ef: int) -> float:
        """Posterior probability of a specific word segment (sums over
        matching links)."""
        total = NEG_INF
        for l in self.links:
            n = self.nodes[l.src]
            if n.word == word and n.sf == sf and l.ef == ef:
                if total <= NEG_INF / 2:
                    total = l.post
                else:
                    m = max(total, l.post)
                    total = m + math.log1p(math.exp(min(total, l.post) - m))
        return min(math.exp(total), 1.0) if total > NEG_INF / 2 else 0.0

    # -- N-best (A*) ---------------------------------------------------------

    def nbest(self, n: int, lm=None, lwf: float = 1.0):
        """A* search over links; yields up to n (hyp, score) in
        descending score order (ps_astar_start/next/hyp)."""
        import heapq
        # heuristic: best remaining score from each node to the end
        order = self._topo_links()
        rem = np.full(len(self.nodes), NEG_INF)
        rem[self.end] = 0.0
        for li in reversed(order):
            l = self.links[li]
            cand = l.ascr + rem[l.dst]
            if cand > rem[l.src]:
                rem[l.src] = cand
        # search states: (-(g+h), counter, node, g, path)
        cnt = 0
        heap = [(-(0.0 + rem[self.start]), cnt, self.start, 0.0, ())]
        results = []
        seen = set()
        while heap and len(results) < n:
            negf, _, nid, g, path = heapq.heappop(heap)
            if nid == self.end:
                words = tuple(self.nodes[self.links[li].src].base
                              for li in path
                              if not self.nodes[self.links[li].src].is_fill)
                if words not in seen:
                    seen.add(words)
                    results.append((" ".join(words), g))
                continue
            for li in self.nodes[nid].exits:
                l = self.links[li]
                lscr = 0.0
                if lm is not None and not self.nodes[l.src].is_fill:
                    w = lm.wid(self.nodes[l.src].base)
                    if w >= 0:
                        # unigram-ish heuristic LM for ordering
                        lscr = lm.raw_score(w, []) / SHIFT * lwf
                g2 = g + l.ascr + lscr
                cnt += 1
                heapq.heappush(heap, (-(g2 + rem[l.dst]), cnt, l.dst, g2,
                                      path + (li,)))
        return results

    # -- output --------------------------------------------------------------

    def _node_ef_range(self, n: LatNode):
        """(first, last) end frame over a node's exit links; final node
        (no exits) spans to the last frame like the reference's bptbl."""
        efs = [self.links[li].ef for li in n.exits]
        if not efs:
            return self.n_frames - 1, self.n_frames - 1
        return min(efs), max(efs)

    def write_htk(self, path: str):
        """HTK SLF format (ps_lattice_write_htk, src/ps_lattice.c:271-349):
        !SENT_START/!SENT_END/!NULL word mapping, v= alternate index,
        a= acoustic score in nats, p= link posterior."""
        with open(path, "w") as f:
            f.write("# Lattice generated by PocketSphinx\n")
            f.write("#\n# Header\n#\n")
            f.write("VERSION=1.0\n")
            f.write(f"start={self.start}\nend={self.end}\n#\n")
            f.write(f"N={len(self.nodes)}\tL={len(self.links)}\n")
            f.write("#\n# Node definitions\n#\n")
            for n in self.nodes:
                altpron = 1
                if "(" in n.word:
                    try:
                        altpron = int(n.word[n.word.rindex("(") + 1:-1])
                    except ValueError:
                        pass
                if n.word == "<s>":
                    w = "!SENT_START"
                elif n.word == "</s>":
                    w = "!SENT_END"
                elif n.is_fill:
                    w = "!NULL"
                else:
                    w = n.base
                f.write(f"I={n.id}\tt={n.sf / self.frate:.2f}\tW={w}"
                        f"\tv={altpron}\n")
            f.write("#\n# Link definitions\n#\n")
            for j, l in enumerate(self.links):
                a = l.ascr * LN_BASE_SHIFTED          # shifted units -> nats
                p = (math.exp(min(l.post, 0.0))
                     if l.post > NEG_INF / 2 else 0.0)
                f.write(f"J={j}\tS={l.src}\tE={l.dst}"
                        f"\ta={a:f}\tp={p:g}\n")

    def write(self, path: str):
        """Sphinx-III DAG format (ps_lattice_write, src/ps_lattice.c:207-268);
        readable by the reference's ps_lattice_read and by Lattice.read.
        Edge scores are raw logmath units (shifted units x 1024)."""
        with open(path, "w") as f:
            f.write("# getcwd: /this/is/bogus\n")
            f.write("# -logbase 1.000100e+00\n#\n")
            f.write(f"Frames {self.n_frames}\n#\n")
            f.write(f"Nodes {len(self.nodes)} "
                    "(NODEID WORD STARTFRAME FIRST-ENDFRAME LAST-ENDFRAME)\n")
            for n in self.nodes:
                fef, lef = self._node_ef_range(n)
                f.write(f"{n.id} {n.word or '(null)'} {n.sf} {fef} {lef}"
                        " ; 0\n")
            f.write("#\n")
            f.write(f"Initial {self.start}\nFinal {self.end}\n#\n")
            f.write("BestSegAscr 0 (NODEID ENDFRAME ASCORE)\n#\n")
            f.write("Edges (FROM-NODEID TO-NODEID ASCORE)\n")
            for l in self.links:
                if l.ascr > 0 or l.ascr <= NEG_INF / 2:
                    continue
                f.write(f"{l.src} {l.dst} {int(round(l.ascr * SHIFT))}\n")
            f.write("End\n")

    # -- input ---------------------------------------------------------------

    @classmethod
    def read_htk(cls, path: str, dictionary=None,
                 frate: int = 100) -> "Lattice":
        """Read an HTK SLF lattice (the format write_htk emits; the
        reference writes but does not read SLF — this closes the loop).
        `a=` scores are nats and are converted back to shifted units."""
        lat = cls(frate=frate)
        n_nodes = n_links = None
        start = end = 0
        times = {}
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if not ln or ln.startswith("#"):
                    continue
                fields = dict(kv.split("=", 1) for kv in ln.split()
                              if "=" in kv)
                if "N" in fields and "L" in fields:
                    n_nodes, n_links = int(fields["N"]), int(fields["L"])
                elif "start" in fields:
                    start = int(fields["start"])
                elif "end" in fields:
                    end = int(fields["end"])
                elif "I" in fields:
                    w = fields.get("W", "!NULL")
                    if w == "!SENT_START":
                        w = "<s>"
                    elif w == "!SENT_END":
                        w = "</s>"
                    is_fill = w == "!NULL" or w.startswith(("<", "[", "++"))
                    sf = int(round(float(fields.get("t", 0)) * frate))
                    times[int(fields["I"])] = sf
                    lat.nodes.append(LatNode(
                        word=w, base=w.split("(")[0], sf=sf,
                        is_fill=is_fill, id=int(fields["I"])))
                elif "J" in fields:
                    src, dst = int(fields["S"]), int(fields["E"])
                    ascr = float(fields.get("a", 0.0)) / LN_BASE_SHIFTED
                    li = len(lat.links)
                    link = LatLink(src=src, dst=dst,
                                   ef=lat.nodes[dst].sf - 1, ascr=ascr)
                    if "p" in fields:
                        p = float(fields["p"])
                        link.post = math.log(p) if p > 0 else NEG_INF
                    lat.links.append(link)
                    lat.nodes[src].exits.append(li)
                    lat.nodes[dst].entries.append(li)
        if n_nodes is not None and len(lat.nodes) != n_nodes:
            raise ValueError(f"{path}: node count mismatch "
                             f"({len(lat.nodes)} != {n_nodes})")
        if n_links is not None and len(lat.links) != n_links:
            raise ValueError(f"{path}: link count mismatch "
                             f"({len(lat.links)} != {n_links})")
        if not lat.nodes:
            raise ValueError(f"{path}: no nodes (not an SLF lattice?)")
        lat.start, lat.end = start, end
        lat.n_frames = max(times.values()) + 1 if times else 0
        if lat.nodes[lat.end].is_fill:
            lat.nodes[lat.end].base = "</s>"
        lat._delete_unreachable()
        return lat

    @classmethod
    def read(cls, path: str, dictionary=None, frate: int = 100) -> "Lattice":
        """Read a Sphinx-III DAG file written by the reference
        (ps_lattice_read, src/ps_lattice.c:388-660) or by Lattice.write.
        Edge scores (raw logmath units) are divided back to shifted units.
        Nodes unreachable from the final node are pruned like the
        reference's dag_mark_reachable + ps_lattice_delete_unreachable."""
        lat = cls(frate=frate)

        def is_fill(word: str) -> bool:
            if dictionary is not None:
                w = dictionary.wordid(word)
                if w >= 0:
                    return dictionary.is_filler(w)
            # <s>/</s>/<sil>/[NOISE]... all live in the filler dict
            # in the reference, so they are non-words for the hyp
            base = word.split("(")[0]
            return base.startswith(("<", "[", "++"))

        with open(path) as f:
            lines = [ln.rstrip("\n") for ln in f]
        it = iter(lines)

        def param(name: str) -> int:
            for ln in it:
                if ln.startswith("#"):
                    continue
                parts = ln.split()
                if parts and parts[0].startswith(name) and len(parts) > 1:
                    try:
                        return int(parts[1])
                    except ValueError:
                        continue
            return -1

        lat.n_frames = param("Frames")
        if lat.n_frames <= 0:
            raise ValueError(f"{path}: Frames parameter missing")
        n_nodes = param("Nodes")
        if n_nodes <= 0:
            raise ValueError(f"{path}: Nodes parameter missing")
        for i in range(n_nodes):
            ln = next(it)
            parts = ln.split()
            if len(parts) < 5 or int(parts[0]) != i:
                raise ValueError(f"{path}: bad node line: {ln!r}")
            word, sf = parts[1], int(parts[2])
            lat.nodes.append(LatNode(word=word, base=word.split("(")[0],
                                     sf=sf, is_fill=is_fill(word), id=i))
        lat.start = param("Initial")
        lat.end = param("Final")
        if not (0 <= lat.start < n_nodes and 0 <= lat.end < n_nodes):
            raise ValueError(f"{path}: Initial/Final missing")
        for _ in range(max(param("BestSegAscr"), 0)):
            next(it)
        for ln in it:
            if ln.startswith("Edges"):
                break
        else:
            raise ValueError(f"{path}: Edges missing")
        ended = False
        for ln in it:
            if ln.startswith("#"):
                continue
            parts = ln.split()
            if len(parts) != 3:
                ended = ln.strip() == "End"
                break
            src, dst, raw = int(parts[0]), int(parts[1]), int(parts[2])
            li = len(lat.links)
            lat.links.append(LatLink(src=src, dst=dst,
                                     ef=lat.nodes[dst].sf - 1,
                                     ascr=raw / SHIFT))
            lat.nodes[src].exits.append(li)
            lat.nodes[dst].entries.append(li)
        if not ended:
            raise ValueError(f"{path}: terminating 'End' missing")
        # final-filler hack: score it as </s> for LM purposes
        if lat.nodes[lat.end].is_fill:
            lat.nodes[lat.end].base = "</s>"
        lat._delete_unreachable()
        return lat

    def _delete_unreachable(self):
        """Prune nodes with no path to the final node, renumber, and
        rebuild link endpoints (ps_lattice_delete_unreachable)."""
        reach = set()
        stack = [self.end]
        while stack:
            nid = stack.pop()
            if nid in reach:
                continue
            reach.add(nid)
            for li in self.nodes[nid].entries:
                stack.append(self.links[li].src)
        newid = {}
        nodes = []
        for n in self.nodes:
            if n.id in reach:
                newid[n.id] = len(nodes)
                nodes.append(n)
        links = []
        linkid = {}
        for i, l in enumerate(self.links):
            if l.src in reach and l.dst in reach:
                linkid[i] = len(links)
                l.src, l.dst = newid[l.src], newid[l.dst]
                links.append(l)
        for n in nodes:
            n.id = newid[n.id]
            n.entries = [linkid[i] for i in n.entries if i in linkid]
            n.exits = [linkid[i] for i in n.exits if i in linkid]
        self.nodes, self.links = nodes, links
        self.start = newid.get(self.start, 0)
        self.end = newid[self.end]
