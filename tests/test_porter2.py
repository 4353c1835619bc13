"""Porter2 stemmer tests.

Golden pairs from the published Snowball english sample vocabulary plus the
stem forms observable in the reference's own goldens
(/root/reference/src/xapian_utils.rs:504-565 Z-terms;
xapian-core-1.4.17.tar.xz!tests/api_termgen.cc:86-120).
"""

from tika_xapian_spark.functions.porter2 import stem

# (word, expected) — expected values are the Z-stem forms from the reference
# goldens where cited, otherwise standard Porter2 outputs.
GOLDEN = [
    # from api_termgen.cc goldens (Z-terms)
    ("cooking", "cook"),
    ("approximately", "approxim"),
    ("is", "is"),
    ("pi", "pi"),
    ("hello", "hello"),
    ("world", "world"),
    ("test", "test"),
    ("stock", "stock"),
    ("school", "school"),
    ("report", "report"),
    ("gnome", "gnome"),
    ("gtk+", "gtk+"),
    ("c++", "c++"),
    ("cd'r", "cd'r"),
    ("toebehoren", "toebehoren"),
    ("time_t", "time_t"),
    ("ibm", "ibm"),
    ("pc", "pc"),
    ("ib", "ib"),
    ("d", "d"),
    ("i", "i"),
    # from reference query goldens (src/xapian_utils.rs)
    ("maybe", "mayb"),  # :565
    ("foo", "foo"),  # :506
    ("bar", "bar"),
    ("baz", "baz"),
    ("bob", "bob"),
    ("hee", "hee"),
    ("rust", "rust"),
    # classic Porter2 behavior checks (published algorithm semantics)
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "tie"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "format"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "communism"),  # 'commun' R1 exception keeps ism? R1=6, ism at 6 -> R2 check
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # exceptions
    ("skis", "ski"),
    ("skies", "sky"),
    ("dying", "die"),
    ("lying", "lie"),
    ("tying", "tie"),
    ("idly", "idl"),
    ("gently", "gentl"),
    ("ugly", "ugli"),
    ("early", "earli"),
    ("only", "onli"),
    ("singly", "singl"),
    ("news", "news"),
    ("howe", "howe"),
    ("atlas", "atlas"),
    ("cosmos", "cosmos"),
    ("bias", "bias"),
    ("andes", "andes"),
    ("inning", "inning"),
    ("outing", "outing"),
    ("canning", "canning"),
    ("herring", "herring"),
    ("earring", "earring"),
    ("proceed", "proceed"),
    ("exceed", "exceed"),
    ("succeed", "succeed"),
    # generat/commun/arsen R1 exceptions
    ("generate", "generat"),
    ("generates", "generat"),
    ("generated", "generat"),
    ("generating", "generat"),
    ("general", "general"),
    ("generally", "general"),
    ("generic", "generic"),
    ("generous", "generous"),
    ("communes", "commune"),
    ("arsenic", "arsenic"),
    ("arsenal", "arsenal"),
    # y handling
    ("cry", "cri"),
    ("by", "by"),
    ("say", "say"),
    ("crying", "cri"),
    ("saying", "say"),
    ("yearly", "year"),  # li-deletion: 'r' is a valid li-ending
    ("enjoy", "enjoy"),
    # short-word e restoration
    ("hoping", "hope"),
    ("exciting", "excit"),
    ("luxuriated", "luxuri"),
]


def test_golden_pairs():
    failures = []
    for word, expected in GOLDEN:
        got = stem(word)
        if got != expected:
            failures.append(f"{word}: got {got!r}, expected {expected!r}")
    assert not failures, "\n".join(failures)


def test_short_words_unchanged():
    for w in ("a", "ab", "io", "x", ""):
        assert stem(w) == w


def test_idempotent_on_common_stems():
    for w in ("cook", "run", "tabl", "hope"):
        assert stem(stem(w)) == stem(w)
