"""Pin the EXACT stemming divergence between the frozen analyzer
(spec v4, tlgs_spark.tokenizer) and PostgreSQL's ``english``
dictionary semantics (tlgs/crawler/crawler.cpp:556-558), per r4
verdict #6 — the residual must be a measured table, not an anecdote.

Reference side: tests/porter_reference.py, an original implementation
of the published Porter (1980) algorithm (PG's Snowball "english" is
Porter2 — a refinement that differs in a handful of documented rules;
every divergence CLASS pinned here behaves identically under both).

The corpus below covers each rule family the v4 spec handles and each
suffix class it deliberately leaves alone. The contract:

- within every family, v4 either fully conflates (retrieval hit, like
  PG) or keeps documented subgroups — the exact subgrouping is pinned;
- the RESIDUAL (families PG conflates that v4 splits) is exactly the
  pinned set — a stemmer change that grows or shrinks it fails here;
- v4 never merges across Porter families (no precision regression:
  conflating less than PG is a recall trade, never a wrong-result
  trade — BM25 scores stay exact for whatever term the analyzer
  produces, and the same analyzer runs at build AND query time, so
  both sides of every search agree).
"""

from tlgs_spark.tokenizer import s_stem

from porter_reference import porter_stem

# surface families: PG/Porter conflates each family to one stem.
# (Checked below — the test fails if the Porter side ever splits one.)
FAMILIES = {
    # --- classes the v3 derivational subset HANDLES ---
    "run": ["run", "runs", "running"],
    "look": ["look", "looks", "looked", "looking"],
    "make": ["make", "makes", "making"],
    "stop": ["stop", "stops", "stopped", "stopping"],
    "try": ["try", "tries", "tried", "trying"],
    "apply": ["apply", "applies", "applied", "applying"],
    "connect": ["connect", "connects", "connected", "connecting", "connection", "connections"],
    "quick": ["quick", "quickly"],
    "edit": ["edit", "edits", "edited", "editing"],
    # the -ize/-yze family (new in v4): -ization/-izer/-ized/-izing
    # all land on the -ize stem; the yz twins cover analyze-type verbs
    "organize": [
        "organize", "organizes", "organized", "organizing",
        "organization", "organizations", "organizer", "organizers",
    ],
    "analyze": ["analyze", "analyzes", "analyzed", "analyzing", "analyzer"],
    "prize": ["prize", "prizes", "prized"],
    # --- classes v4 deliberately leaves alone (the residual) ---
    "happy": ["happy", "happiness"],
    "adjust": ["adjust", "adjustment", "adjustable"],
    "decisive": ["decisive", "decisiveness"],
    "active": ["active", "activate", "activation"],
    "depend": ["depend", "dependent", "dependence"],
    "create": ["create", "creates", "created", "creating"],
    "hope": ["hope", "hopeful", "hopefulness"],
}

# the pinned v4 subgrouping per family: surface → v4 stem. The residual
# families are exactly those whose values span > 1 distinct stem.
PINNED_V4 = {
    "run": {"run": "run", "runs": "run", "running": "run"},
    "look": {"look": "look", "looks": "look", "looked": "look", "looking": "look"},
    "make": {"make": "make", "makes": "make", "making": "make"},
    "stop": {"stop": "stop", "stops": "stop", "stopped": "stop", "stopping": "stop"},
    "try": {"try": "try", "tries": "try", "tried": "try", "trying": "try"},
    "apply": {"apply": "apply", "applies": "apply", "applied": "apply", "applying": "apply"},
    "connect": {
        "connect": "connect", "connects": "connect", "connected": "connect",
        "connecting": "connect", "connection": "connect", "connections": "connect",
    },
    "quick": {"quick": "quick", "quickly": "quick"},
    "edit": {"edit": "edit", "edits": "edit", "edited": "edit", "editing": "edit"},
    "organize": {
        "organize": "organize", "organizes": "organize", "organized": "organize",
        "organizing": "organize", "organization": "organize",
        "organizations": "organize", "organizer": "organize", "organizers": "organize",
    },
    "analyze": {
        "analyze": "analyze", "analyzes": "analyze", "analyzed": "analyze",
        "analyzing": "analyze", "analyzer": "analyze",
    },
    "prize": {"prize": "prize", "prizes": "prize", "prized": "prize"},
    # residual families (v4 splits where PG conflates):
    "happy": {"happy": "happy", "happiness": "happiness"},
    "adjust": {"adjust": "adjust", "adjustment": "adjustment", "adjustable": "adjustable"},
    "decisive": {"decisive": "decisive", "decisiveness": "decisiveness"},
    "active": {"active": "active", "activate": "activate", "activation": "activat"},
    "depend": {"depend": "depend", "dependent": "dependent", "dependence": "dependence"},
    # e-final split: -s conflates but the 1b2 subset cannot restore the
    # e after -ed/-ing (documented at tokenizer.py 'divergence contract')
    "create": {"create": "create", "creates": "create", "created": "creat", "creating": "creat"},
    "hope": {"hope": "hope", "hopeful": "hopeful", "hopefulness": "hopefulness"},
}

# families PG conflates that v4 splits — THE residual set, frozen.
# (v3 also split "organize"; the v4 -ize/-yze rules closed it.)
PINNED_RESIDUAL = {
    "happy", "adjust", "decisive", "active", "depend",
    "create", "hope",
}


# Porter-1980 artifact, fixed in Porter2 (= PG's actual dictionary):
# step 1c's (*v*) y→i needs a vowel BEFORE the y, so "try"/"trying"
# keep y while "tries"/"tried" land on "tri" — Porter2 conflates the
# whole family (try→tri), and so does v3 (→"try"). The 1980 reference
# is pinned with this split so the stand-in's one known delta vs PG
# is itself measured, not hidden.
PORTER1980_SPLIT_EXCEPTIONS = {
    "try": {"try", "tri"},
    # same 1980-only gap: no general -li rule ("quickly"->"quickli");
    # Porter2 deletes li after a valid ending (quickly->quick, = v3)
    "quick": {"quick", "quickli"},
}


def test_porter_reference_conflates_every_family():
    for fam, forms in FAMILIES.items():
        stems = {porter_stem(w) for w in forms}
        expected = PORTER1980_SPLIT_EXCEPTIONS.get(fam)
        if expected is not None:
            assert stems == expected, (fam, stems)
        else:
            assert len(stems) == 1, (fam, stems)


def test_v4_subgrouping_is_exactly_as_pinned():
    got = {
        fam: {w: s_stem(w) for w in forms} for fam, forms in FAMILIES.items()
    }
    assert got == PINNED_V4


def test_residual_set_is_exactly_as_pinned():
    residual = {
        fam
        for fam, forms in FAMILIES.items()
        if len({s_stem(w) for w in forms}) > 1
    }
    assert residual == PINNED_RESIDUAL


def test_no_cross_family_merges():
    """v4 must never conflate two words that Porter assigns to
    DIFFERENT families — less conflation than PG is a recall trade,
    cross-family conflation would be a precision bug."""
    v3_to_family: dict = {}
    for fam, forms in FAMILIES.items():
        for w in forms:
            v3_to_family.setdefault(s_stem(w), set()).add(fam)
    offenders = {k: v for k, v in v3_to_family.items() if len(v) > 1}
    assert not offenders, offenders


def test_residual_families_remain_self_searchable():
    """The residual costs recall ACROSS a family, never within a term:
    each split surface form still stems identically at index and query
    time (same frozen analyzer on both sides), so searching the surface
    form the author wrote always finds it."""
    for fam in PINNED_RESIDUAL:
        for w in FAMILIES[fam]:
            assert s_stem(w) == s_stem(w)  # deterministic
            # and the query tokenizer produces that very term
            from tlgs_spark.tokenizer import tokenize_query

            assert tokenize_query(w) == [s_stem(w)]
