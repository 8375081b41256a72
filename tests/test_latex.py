"""LaTeX extraction tests (round 11): structural scanner vs the
regex-pass failure modes — comments with braces, escaped specials,
nested groups, dropped environments, math spans — plus the Spark
surface and the synthetic corpus contract.
"""

from datasplash_spark.functions.latex import (
    latex_text_features,
    latex_to_text,
    synthesize_latex_from_text,
)


def test_basic_prose_and_commands():
    src = (
        "\\begin{document}\\section{Intro}\n"
        "hello \\textbf{bold world} and \\emph{style} text.\n"
        "\\end{document}"
    )
    assert latex_to_text(src) == "Intro\nhello bold world and style text."


def test_comment_with_braces_does_not_break_grouping():
    # a regex brace-matcher would pair the comment's brace
    src = "a % comment {unbalanced\nb \\textbf{c} d"
    assert latex_to_text(src) == "a\nb c d"


def test_escaped_specials():
    assert latex_to_text(r"100\% and \$5 and a\_b and \{x\}") == (
        "100% and $5 and a_b and {x}"
    )


def test_math_spans_drop():
    assert latex_to_text(r"a $x+1$ b $$y$$ c \(z\) d \[w\] e") == (
        "a b c d e"
    )


def test_drop_environments_wholesale():
    src = (
        "before\n\\begin{figure}[h]\n\\includegraphics{f.png}\n"
        "\\caption{inside figure}\n\\end{figure}\nafter"
    )
    out = latex_to_text(src)
    assert "inside figure" not in out
    assert out == "before\nafter"
    # nested-prose env (itemize is NOT dropped): items keep text
    src2 = "\\begin{itemize}\\item one \\item two\\end{itemize}"
    assert latex_to_text(src2) == "one two"


def test_reference_machinery_drops_unknown_macros_keep():
    src = r"see \cite{a,b} and \ref{fig:1} but \mymacro{keep this}"
    assert latex_to_text(src) == "see and but keep this"


def test_preamble_dropped_only_with_document_env():
    src = (
        "\\documentclass{article}\n\\usepackage{x} % {noise}\n"
        "\\begin{document}\nbody text\n\\end{document}\ntrailing junk"
    )
    assert latex_to_text(src) == "body text"
    # no document env: everything scans (lenient fragment mode)
    assert latex_to_text("plain fragment") == "plain fragment"


def test_lenient_on_malformed():
    # unbalanced groups and stray backslashes never raise
    assert latex_to_text("\\textbf{unclosed and $unclosed") == "unclosed and"
    assert latex_to_text("\\") == ""


def test_latex_features_spark(spark):
    docs = spark.createDataFrame(
        [(i, " ".join("w%d" % j for j in range(6 + i))) for i in range(6)],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in latex_text_features(
            synthesize_latex_from_text(docs)
        ).collect()
    }
    assert len(out) == 6
    for i in range(6):
        r = out[i]
        assert r.ok, r
        text = " ".join("w%d" % j for j in range(6 + i))
        n = 1 + len(text) % 3
        words = text.split(" ")
        expect = []
        for u in range(n):
            unit = " ".join(words[u::n])
            expect.append(
                "Section %d" % u + ("\n" + unit if unit else "")
            )
        assert r.text == "\n".join(expect), (r.text, expect)


def test_starred_commands_match_base():
    assert latex_to_text(r"\section*{Unnumbered} body") == (
        "Unnumbered\nbody"
    )
    assert latex_to_text(r"\begin{figure*}dropped\end{figure*}x") == "x"


def test_control_space_separates_words():
    # review fix (round 11): '\ ' after abbreviations must not glue
    # the surrounding words
    assert latex_to_text(r"Dr.\ Smith et\,al\; here") == (
        "Dr. Smith et al here"
    )
