from high_performance_parallel_search_engine_ray.functions.tokenize import (
    TokenizerConfig,
    kept_terms,
    tokenize_configured,
    tokenize_openmp,
    tokenize_query,
    tokenize_serial,
)


def test_serial_delims_and_stopwords():
    text = 'The quick,brown;fox:jumps!over?the "lazy" (dog) [and] {cat} <now>'
    # strtok on " \t\n\r.,;:!?\"()[]{}<>", lowercase, stopwords the/a/an/in/of
    assert tokenize_serial(text) == [
        "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and", "cat", "now",
    ]


def test_serial_keeps_hyphens_and_slashes():
    # serial delimiters do NOT split on - / _ (the OpenMP variant does)
    assert tokenize_serial("co-op a/b x_y") == ["co-op", "a/b", "x_y"]
    assert tokenize_openmp("co-op a/b x_y not") == ["not"]  # all pieces < 3 chars


def test_openmp_length_window():
    assert tokenize_openmp("ab abc " + "z" * 50 + " " + "z" * 51) == ["abc", "z" * 50]


def test_kept_terms_cut():
    toks = ["ok", "x" * 62, "y" * 63]
    assert kept_terms(toks) == ["ok", "x" * 62]


def test_query_tokenizer_whitespace_only():
    # ranking.c:36 splits the query on whitespace ONLY: punctuation sticks
    assert tokenize_query("The quick,brown Fox") == ["quick,brown", "fox"]


def test_configured():
    cfg = TokenizerConfig(min_token_len=3, require_letter=True)
    assert tokenize_configured("One, two2 33 a!", cfg) == ["one", "two2"]
