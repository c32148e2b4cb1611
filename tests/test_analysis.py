from engine.analysis import (
    get_analyzer,
    porter_stem,
    split_ident,
    tokenize_code,
    tokenize_simple,
)

# Porter 1980 paper example vectors (published in the algorithm description).
PORTER_PAIRS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("conformabli", "conform"), ("radicalli", "radic"),
    # (paper's step-2 example shows "different"; the full pipeline's
    # step 4 then strips "ent", m("differ")=2>1)
    ("differentli", "differ"), ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


def test_porter_published_vectors():
    bad = [(w, porter_stem(w), want) for w, want in PORTER_PAIRS if porter_stem(w) != want]
    assert not bad, f"porter mismatches: {bad}"


def test_split_ident():
    assert split_ident("snake_case_name") == ["snake", "case", "name"]
    assert split_ident("camelCaseName") == ["camel", "Case", "Name"]
    assert split_ident("getHTTPResponse2") == ["get", "HTTP", "Response", "2"]
    assert split_ident("PascalCase") == ["Pascal", "Case"]
    assert split_ident("var2") == ["var", "2"]
    assert split_ident("utf8_ok") == ["utf", "8", "ok"]
    assert split_ident("plain") == ["plain"]
    assert split_ident("X") == ["X"]


def test_tokenize_code_golden():
    s = "def getUserName(self): return user_name2  # héllo"
    assert tokenize_code(s) == [
        "def", "get", "user", "name", "self", "return", "user", "name", "2",
        "h", "llo",  # non-ASCII é splits the raw token
    ]
    assert tokenize_code("") == []
    assert tokenize_code("+-*/") == []
    # length bound: 65-char token dropped, 64 kept
    assert tokenize_code("a" * 65) == []
    assert tokenize_code("a" * 64) == ["a" * 64]


def test_tokenize_simple_matches_sql_split():
    assert tokenize_simple("Foo  bar baz ") == ["foo", "bar", "baz"]


def test_analyzer_modes():
    code = get_analyzer("code")
    nostem = get_analyzer("code_nostem")
    assert code("running runs") == ["run", "run"]
    assert nostem("running runs") == ["running", "runs"]
    # stemming skips digit-bearing tokens
    assert code("var2 testing") == ["var", "2", "test"]
    # memo cache consistency
    assert code("running") == code("running")


def test_analyzer_casefold_symmetry():
    code = get_analyzer("code")
    assert code("Return") == code("return")


def test_vectorized_equals_rowwise():
    """The vectorized AnalyzeDocs batch path must be bit-identical to
    applying the per-doc analyzer row by row, for every analyzer."""
    import pyarrow as pa

    from engine.ids import assign_ids
    from engine.postings import AnalyzeDocs
    from tests.fixtures.gen import gen_corpus

    batch = assign_ids(pa.Table.from_pylist(gen_corpus(120, seed=21)), 8)
    for name in ("code", "code_nostem", "simple"):
        vec = AnalyzeDocs(name)(batch)
        ref = AnalyzeDocs(name).rowwise(batch)
        for col in vec.column_names:
            assert vec.column(col).equals(ref.column(col)), (name, col)
