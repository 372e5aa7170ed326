"""Extended lib/API coverage: the P1/P2 handler rows of SURVEY.md §3.B
and Transformation config surfaces not exercised by the core corpus."""

import logging
import operator

import pytest

from inxs_spark.kernel import (
    Any, HasNamespace, If, MatchesXPath, Node, Ref, Rule, Transformation,
    TRAVERSE_WIDTH_FIRST, parse_xml, serialize,
)
from inxs_spark.kernel import lib
from inxs_spark.kernel.xpath import XPathError, xpath_all


X = parse_xml


class TestMoreHandlers:
    def test_get_and_set_tail(self):
        root = X("<a><b>t</b>old-tail</a>")
        got = []
        t = Transformation(
            Rule("b", (lib.get_tail, lambda previous_result: got.append(previous_result))),
            Rule("b", (lib.set_tail("new-tail"),)),
            copy=False,
        )
        t(root)
        assert got == ["old-tail"]
        assert root.children[0].tail == "new-tail"

    def test_pop_attributes_returns_dict(self):
        got = []
        t = Transformation(
            Rule("a", (lib.pop_attributes("x", "y", "missing"),
                       lambda previous_result: got.append(previous_result)))
        )
        t(X('<a x="1" y="2" z="3"/>'))
        assert got == [{"x": "1", "y": "2"}]

    def test_prefix_attributes(self):
        root = X('<a x="1" y="2"/>')
        Transformation(Rule("a", (lib.prefix_attributes("data-", "x"),)), copy=False)(root)
        assert root.attrib == {"data-x": "1", "y": "2"}

    def test_clear_attributes(self):
        root = X('<a x="1" y="2"/>')
        Transformation(Rule("a", (lib.clear_attributes,)), copy=False)(root)
        assert root.attrib == {}

    def test_sub_and_lowercase(self):
        root = X("<a><p>Hello WORLD 42</p></a>")
        Transformation(
            Rule("p", (lib.sub(r"\d+", "N"), lib.lowercase)), copy=False
        )(root)
        assert root.children[0].text == "hello world n"

    def test_make_element_and_merge(self):
        root = X("<a><dst>d</dst></a>")
        t = Transformation(
            lib.make_element("new", {"k": "v"}, "fresh"),
            lib.put_variable("built"),
            Rule("dst", (lib.get_variable("built"), lib.merge())),
            copy=False,
        )
        t(root)
        dst = root.children[0]
        assert dst.text == "dfresh"  # merged text concatenated

    def test_merge_moves_children(self):
        src = X("<src>s<c1/>tail</src>")
        root = X("<a><dst><e/></dst></a>")
        t = Transformation(
            Rule("dst", (lib.f(lambda s: s, Ref("source")), lib.merge())),
            copy=False,
        )
        t(root, source=src)
        dst = root.children[0]
        assert [c.tag for c in dst.children] == ["e", "c1"]
        assert dst.children[0].tail == "s"  # src text folded before children

    def test_resolve_xpath_to_element(self):
        root = X("<a><b id='1'/><b id='2'/></a>")
        t = Transformation(
            lib.resolve_xpath_to_element("target"),
            context={"target": ".//b[@id='2']"},
            result_object="context.target",
            copy=False,
        )
        got = t(root)
        assert got is root.children[1]

    def test_join_to_set(self):
        root = X('<a rel="x"/>')
        t = Transformation(Rule("a", (lib.join_to_set("rel", "y"),
                                      lib.join_to_set("rel", "x"))), copy=False)
        t(root)
        assert root.attrib["rel"] == "x y"

    def test_insert_fontawesome_icon(self):
        root = X("<button>Save</button>")
        Transformation(
            Rule("button", (lib.insert_fontawesome_icon("save", "before"),)),
            copy=False,
        )(root)
        assert serialize(root) == '<button><i class="fa fa-save"/> Save</button>'

    def test_cleanup_namespaces(self):
        root = X("<a><b/></a>")
        root.attrib["xmlns:junk"] = "urn:y"
        Transformation(Rule("/", (lib.cleanup_namespaces,)), copy=False)(root)
        assert "xmlns:junk" not in root.attrib

    def test_drop_siblings_right(self):
        root = X("<a><keep/><main>m</main><x/><y/>tail</a>")
        Transformation(Rule("main", (lib.drop_siblings("right"),)), copy=False)(root)
        assert serialize(root) == "<a><keep/><main>m</main></a>"

    def test_debug_handlers_smoke(self, caplog):
        t = Transformation(
            Rule("a", (lib.debug_message("visiting"),
                       lib.debug_symbols("context", "missing_sym"),
                       lib.debug_dump_document)),
        )
        with caplog.at_level(logging.DEBUG, logger="inxs_spark.kernel"):
            t(X("<a/>"))
        messages = " ".join(r.message for r in caplog.records)
        assert "visiting" in messages and "document:" in messages

    def test_extract_text_handler(self):
        got = []
        t = Transformation(
            Rule("b", (lib.extract_text, lambda previous_result: got.append(previous_result)))
        )
        t(X("<a><b>x<c>y</c>z</b></a>"))
        assert got == ["xyz"]


class TestConfigSurfaces:
    def test_common_rule_conditions(self):
        hits = []
        t = Transformation(
            Rule("*", (lambda element: hits.append(element.tag),)),
            common_rule_conditions={"go": "1"},
        )
        t(X('<a go="1"><b/><c go="1"/></a>'))
        assert hits == ["a", "c"]

    def test_result_object_context_namespace(self):
        t = Transformation(
            lib.put_variable("k", value="v"), result_object="context"
        )
        ctx = t(X("<a/>"))
        assert ctx.k == "v"

    def test_result_object_none(self):
        t = Transformation(lib.put_variable("k", value="v"), result_object=None)
        assert t(X("<a/>")) is None

    def test_result_object_unknown_symbol_raises(self):
        t = Transformation(result_object="nope.deep")
        with pytest.raises(AttributeError):
            t(X("<a/>"))

    def test_unknown_config_rejected(self):
        with pytest.raises(TypeError):
            Transformation(bogus_option=1)

    def test_bad_group_rejected(self):
        with pytest.raises(TypeError):
            Transformation([Rule("a", ()), "not-a-rule"])

    def test_transformation_without_document(self):
        """Simple steps run even with no tree (root=None) — pure
        context computation; rules are skipped."""
        t = Transformation(
            lib.put_variable("x", value="1"),
            Rule("*", (lib.put_variable("x", value="2"),)),
            result_object="context.x",
        )
        assert t(None) == "1"

    def test_nsmap_prefixed_xpath(self):
        doc = X('<d:doc xmlns:d="urn:x"><d:keep>k</d:keep></d:doc>')
        hits = []
        t = Transformation(
            Rule(MatchesXPath(".//d:keep"), (lambda element: hits.append(element.localname),)),
            nsmap={"d": "urn:x"},
        )
        t(doc)
        assert hits == ["keep"]

    def test_xpath_callable_late_binding(self):
        hits = []
        t = Transformation(
            Rule(MatchesXPath(lambda context: f".//p[@cls='{context.want}']"),
                 (lambda element: hits.append(element.text),)),
            context={"want": "x"},
        )
        t(X("<d><p cls='x'>yes</p><p cls='y'>no</p></d>"))
        assert hits == ["yes"]

    def test_width_first_traversal(self):
        order = []
        Transformation(
            Rule("*", (lambda element: order.append(element.tag),),
                 traversal_order=TRAVERSE_WIDTH_FIRST)
        )(X("<a><b><d/></b><c/></a>"))
        assert order == ["a", "b", "c", "d"]

    def test_if_with_operator_ge(self):
        hits = []
        t = Transformation(
            Rule(("n", If(Ref("threshold"), operator.le, lambda element: int(element.text))),
                 (lambda element: hits.append(element.text),)),
            context={"threshold": 10},
        )
        t(X("<d><n>5</n><n>15</n></d>"))
        assert hits == ["15"]


class TestXPathSubset:
    def test_absolute_and_relative(self):
        root = X("<a><b><c/></b><c/></a>")
        assert len(xpath_all(root, "/a/c", root=root)) == 1
        assert len(xpath_all(root, "//c", root=root)) == 2
        assert len(xpath_all(root, ".//b/c")) == 1

    def test_predicates(self):
        root = X("<a><p k='1'>one</p><p k='2'>two</p><p>three</p></a>")
        assert [n.text for n in xpath_all(root, ".//p[@k]")] == ["one", "two"]
        assert [n.text for n in xpath_all(root, './/p[@k="2"]')] == ["two"]
        assert [n.text for n in xpath_all(root, ".//p[2]")] == ["two"]
        assert [n.text for n in xpath_all(root, ".//p[text()='three']")] == ["three"]

    def test_child_existence_predicate_and_wildcard(self):
        root = X("<a><b><c/></b><b/></a>")
        assert len(xpath_all(root, ".//b[c]")) == 1
        assert len(xpath_all(root, "./*")) == 2

    def test_parent_step(self):
        root = X("<a><b><c/></b></a>")
        (c,) = xpath_all(root, ".//c")
        assert xpath_all(c, "..")[0].tag == "b"

    def test_relative_descendant_excludes_context(self):
        """ElementTree/lxml parity: './/a' from a context tagged 'a'
        returns descendants only; absolute '//a' includes the root
        (descendant-or-self from the document node)."""
        import xml.etree.ElementTree as ET

        for xml, expr in [
            ("<a><b><a/></b></a>", ".//a"),
            ("<a><a><a/></a></a>", ".//a"),
            ("<r><x><y><x/></y></x></r>", ".//x//x"),
        ]:
            root = X(xml)
            assert len(xpath_all(root, expr)) == len(ET.fromstring(xml).findall(expr))
        root = X("<a><b><a/></b></a>")
        assert len(xpath_all(root, "//a", root=root)) == 2

    def test_unsupported_raises(self):
        with pytest.raises(XPathError):
            xpath_all(X("<a/>"), ".//a[name()='q']")
        with pytest.raises(XPathError):
            xpath_all(X("<a/>"), ".//a[@x ~ 'y']")

    def test_functions_and_boolean_logic(self):
        root = X("<d><p class='ad box'>a</p><p class='main'>b</p>"
                 "<p id='nav-top'>c</p><p>d</p></d>")
        get = lambda e: [n.text for n in xpath_all(root, e, root=root)]
        assert get(".//p[contains(@class,'ad')]") == ["a"]
        assert get(".//p[starts-with(@id,'nav')]") == ["c"]
        assert get(".//p[not(@class) and not(@id)]") == ["d"]
        assert get(".//p[@class='main' or @id]") == ["b", "c"]
        assert get(".//p[@class!='main']") == ["a"]  # absent attr != never true

    def test_position_and_last(self):
        root = X("<d><p>1</p><p>2</p><p>3</p><p>4</p></d>")
        get = lambda e: [n.text for n in xpath_all(root, e, root=root)]
        assert get(".//p[last()]") == ["4"]
        assert get(".//p[position()<3]") == ["1", "2"]
        assert get(".//p[position()>=2 and position()!=3]") == ["2", "4"]

    def test_sequential_predicates_rerank(self):
        root = X("<d><p>x</p><p k='1'>a</p><p k='2'>b</p></d>")
        # [@k][2] must re-rank AFTER the attribute filter: the second
        # k-bearing p is 'b' (global position 3)
        assert [n.text for n in xpath_all(root, ".//p[@k][2]", root=root)] == ["b"]

    def test_descendant_positional_is_per_parent(self):
        root = X("<d><s><p>a</p><p>b</p></s><s><p>c</p></s></d>")
        # ElementTree semantics: .//p[1] = first p within EACH parent
        assert [n.text for n in xpath_all(root, ".//p[1]", root=root)] == ["a", "c"]

    def test_union(self):
        root = X("<d><a>1</a><b>2</b><c>3</c></d>")
        got = [n.text for n in xpath_all(root, ".//a | .//c", root=root)]
        assert got == ["1", "3"]

    def test_clark_notation(self):
        root = X('<d:doc xmlns:d="urn:x"><d:k/></d:doc>')
        assert len(xpath_all(root, ".//{urn:x}k")) == 1
