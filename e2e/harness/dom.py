# SPDX-License-Identifier: Apache-2.0
"""A small DOM implemented on the mjs object model.

Covers the API surface the web UI (``server/webui/index.html``) uses:
element tree + innerHTML/textContent, getElementById / querySelector(All)
with a practical selector subset, classList / dataset / style, event
listeners with bubbling, and form control ``value``.

Elements ARE ``JSObject``s (dict-backed), so the interpreter's normal
member access works; computed properties (innerHTML, children, …) ride the
JSObject ``accessors`` side table that ``utils/mjs.py`` consults first.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from streamkit_tpu.utils.mjs import (
    UNDEFINED,
    JSArray,
    JSObject,
    from_python,
    js_to_string,
)

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class TextNode(JSObject):
    """DOM text node (nodeType 3)."""

    def __init__(self, text: str):
        super().__init__()
        self["nodeType"] = 3.0
        self["textContent"] = text
        self.parent: Optional["Element"] = None


def _camel_to_data_attr(key: str) -> str:
    return "data-" + re.sub(r"([A-Z])", lambda m: "-" + m.group(1).lower(), key)


class _Dataset(JSObject):
    """``el.dataset`` — writes reflect into ``data-*`` attributes so
    attribute selectors (``[data-node]``) see them."""

    def __init__(self, element: "Element"):
        super().__init__()
        object.__setattr__(self, "_element", element)

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        el = object.__getattribute__(self, "_element")
        el.attrs[_camel_to_data_attr(str(key))] = js_to_string(value)


class _ClassList(JSObject):
    def __init__(self, element: "Element"):
        super().__init__()
        self["add"] = lambda *names: element._class_add(names)
        self["remove"] = lambda *names: element._class_remove(names)
        self["toggle"] = lambda name="", force=UNDEFINED: element._class_toggle(name, force)
        self["contains"] = lambda name="": name in element._classes()


class Event(JSObject):
    def __init__(self, etype: str, target: "Element", init: Optional[dict] = None):
        super().__init__()
        self["type"] = etype
        self["target"] = target
        self["currentTarget"] = target
        self["defaultPrevented"] = False
        self["propagationStopped"] = False
        self["preventDefault"] = lambda: self.__setitem__("defaultPrevented", True)
        self["stopPropagation"] = lambda: self.__setitem__("propagationStopped", True)
        for k, v in (init or {}).items():
            self[k] = from_python(v) if not isinstance(v, (JSObject, JSArray)) else v


class Element(JSObject):
    """A DOM element. Children live in ``self.child_nodes`` (Element or
    TextNode); attributes in ``self.attrs``."""

    def __init__(self, tag: str, document: Optional["Document"] = None):
        super().__init__()
        self.tag = tag.lower()
        self.attrs: dict = {}
        self.child_nodes: List[object] = []
        self.parent: Optional[Element] = None
        self.document = document
        self.listeners: dict = {}  # type -> [fn]
        self["tagName"] = self.tag.upper()
        self["nodeType"] = 1.0
        self["dataset"] = _Dataset(self)
        self["style"] = JSObject()
        self["classList"] = _ClassList(self)
        self["scrollTop"] = 0.0
        self["value"] = ""
        # host methods -------------------------------------------------------
        self["appendChild"] = self._append_child
        self["append"] = lambda *nodes: [self._append_child(n) for n in nodes] and None
        self["removeChild"] = self._remove_child
        self["remove"] = self._remove_self
        self["prepend"] = self._prepend
        self["setAttribute"] = self._set_attribute
        self["getAttribute"] = self._get_attribute
        self["removeAttribute"] = lambda name="": self.attrs.pop(js_to_string(name), None) and None
        self["hasAttribute"] = lambda name="": js_to_string(name) in self.attrs
        self["addEventListener"] = self._add_listener
        self["removeEventListener"] = self._remove_listener
        self["dispatchEvent"] = lambda ev: self._dispatch_js(ev)
        self["click"] = lambda: self.dispatch("click")
        self["focus"] = lambda: None
        self["blur"] = lambda: None
        self["select"] = lambda: None
        self["querySelector"] = lambda sel="": self.query_selector(js_to_string(sel))
        self["querySelectorAll"] = lambda sel="": JSArray(self.query_selector_all(js_to_string(sel)))
        self["closest"] = self._closest
        self["matches"] = lambda sel="": _matches_compound_chain(self, js_to_string(sel))
        self["getBoundingClientRect"] = self._rect
        self["getScreenCTM"] = self._identity_ctm
        self["insertBefore"] = self._insert_before
        self["contains"] = self._contains
        # computed properties --------------------------------------------------
        self.accessors = {
            "innerHTML": (lambda: self._get_inner_html(), lambda v: self._set_inner_html(v)),
            "outerHTML": (lambda: serialize(self), None),
            "textContent": (lambda: self._get_text(), lambda v: self._set_text(v)),
            "innerText": (lambda: self._get_text(), lambda v: self._set_text(v)),
            "children": (lambda: JSArray(self.element_children()), None),
            "childNodes": (lambda: JSArray(self.child_nodes), None),
            "firstChild": (lambda: self.child_nodes[0] if self.child_nodes else None, None),
            "lastChild": (lambda: self.child_nodes[-1] if self.child_nodes else None, None),
            "parentElement": (lambda: self.parent, None),
            "parentNode": (lambda: self.parent, None),
            "className": (
                lambda: self.attrs.get("class", ""),
                lambda v: self.attrs.__setitem__("class", js_to_string(v)),
            ),
            "id": (
                lambda: self.attrs.get("id", ""),
                lambda v: self.attrs.__setitem__("id", js_to_string(v)),
            ),
            "scrollHeight": (lambda: float(len(self.child_nodes)) * 16.0, None),
            "offsetWidth": (lambda: 800.0, None),
            "offsetHeight": (lambda: 600.0, None),
            "checked": (
                lambda: self.get("_checked", "checked" in self.attrs),
                lambda v: self.__setitem__("_checked", bool(v)),
            ),
            "disabled": (
                lambda: self.get("_disabled", "disabled" in self.attrs),
                lambda v: self.__setitem__("_disabled", bool(v)),
            ),
            "options": (lambda: JSArray(self.element_children()), None),
            "files": (lambda: self.get("_files", JSArray()), None),
        }
        if self.tag == "select":
            # browsers default a <select>'s value to the selected (else
            # first) <option> — scripts read .value without ever setting it
            self.accessors["value"] = (
                self._select_value,
                lambda v: dict.__setitem__(self, "value", js_to_string(v)),
            )

    def _select_value(self):
        v = dict.get(self, "value", "")
        if v != "":
            return v
        opts = [c for c in self.iter_tree() if c.tag == "option"]
        for o in opts:
            if "selected" in o.attrs:
                return o.attrs.get("value", o._get_text())
        return opts[0].attrs.get("value", opts[0]._get_text()) if opts else ""

    # -- tree ------------------------------------------------------------------
    def element_children(self) -> List["Element"]:
        return [c for c in self.child_nodes if isinstance(c, Element)]

    @staticmethod
    def _iremove(lst: list, node) -> bool:
        """Identity-based list removal (Elements are dicts: ``==`` would
        compare content and can match the wrong sibling)."""
        for i, x in enumerate(lst):
            if x is node:
                del lst[i]
                return True
        return False

    def _adopt(self, node):
        if isinstance(node, (Element, TextNode)):
            if getattr(node, "parent", None) is not None and node.parent is not self:
                self._iremove(node.parent.child_nodes, node)
            node.parent = self
        return node

    def _append_child(self, node=None):
        if isinstance(node, str):
            node = TextNode(node)
        self.child_nodes.append(self._adopt(node))
        return node

    def _prepend(self, node=None):
        if isinstance(node, str):
            node = TextNode(node)
        self.child_nodes.insert(0, self._adopt(node))
        return node

    def _insert_before(self, node=None, ref=None):
        self._adopt(node)
        idx = len(self.child_nodes)
        for i, x in enumerate(self.child_nodes):
            if x is ref:
                idx = i
                break
        self.child_nodes.insert(idx, node)
        return node

    def _remove_child(self, node=None):
        if self._iremove(self.child_nodes, node) and isinstance(node, (Element, TextNode)):
            node.parent = None
        return node

    def _remove_self(self):
        if self.parent is not None:
            self.parent._remove_child(self)

    def _contains(self, node=None):
        cur = node
        while cur is not None:
            if cur is self:
                return True
            cur = getattr(cur, "parent", None)
        return False

    def iter_tree(self):
        for c in self.child_nodes:
            if isinstance(c, Element):
                yield c
                yield from c.iter_tree()

    # -- attributes / classes ----------------------------------------------------
    def _set_attribute(self, name="", value=""):
        name = js_to_string(name)
        self.attrs[name] = js_to_string(value)
        if name.startswith("data-"):
            key = re.sub(r"-([a-z])", lambda m: m.group(1).upper(), name[5:])
            dict.__setitem__(self["dataset"], key, self.attrs[name])
        if name == "value":
            dict.__setitem__(self, "value", self.attrs[name])

    def _get_attribute(self, name=""):
        v = self.attrs.get(js_to_string(name))
        return v if v is not None else None

    def _classes(self) -> List[str]:
        return [c for c in self.attrs.get("class", "").split() if c]

    def _class_add(self, names):
        cs = self._classes()
        for n in names:
            n = js_to_string(n)
            if n not in cs:
                cs.append(n)
        self.attrs["class"] = " ".join(cs)

    def _class_remove(self, names):
        cs = [c for c in self._classes() if c not in {js_to_string(n) for n in names}]
        self.attrs["class"] = " ".join(cs)

    def _class_toggle(self, name, force=UNDEFINED):
        name = js_to_string(name)
        has = name in self._classes()
        want = (not has) if force is UNDEFINED else bool(force)
        if want and not has:
            self._class_add([name])
        if not want and has:
            self._class_remove([name])
        return want

    # -- content -----------------------------------------------------------------
    def _get_text(self) -> str:
        out = []
        for c in self.child_nodes:
            if isinstance(c, TextNode):
                out.append(c.get("textContent", ""))
            elif isinstance(c, Element):
                out.append(c._get_text())
        return "".join(out)

    def _set_text(self, v):
        self.child_nodes = []
        s = js_to_string(v)
        if s:
            self._append_child(TextNode(s))

    def _get_inner_html(self) -> str:
        return "".join(serialize(c) for c in self.child_nodes)

    def _set_inner_html(self, v):
        self.child_nodes = []
        for node in parse_fragment(js_to_string(v), self.document):
            self._append_child(node)

    # -- selectors ----------------------------------------------------------------
    def query_selector(self, sel: str):
        hits = self.query_selector_all(sel, first_only=True)
        return hits[0] if hits else None

    def query_selector_all(self, sel: str, first_only: bool = False):
        out = []
        for alt in sel.split(","):
            alt = alt.strip()
            if not alt:
                continue
            for el in self.iter_tree():
                if _matches_compound_chain(el, alt) and not any(x is el for x in out):
                    out.append(el)
                    if first_only:
                        return out
        return out

    def _closest(self, sel=""):
        sel = js_to_string(sel)
        cur = self
        while cur is not None:
            if _matches_compound_chain(cur, sel):
                return cur
            cur = cur.parent
        return None

    # -- events ---------------------------------------------------------------------
    def _add_listener(self, etype="", fn=None, *_opts):
        self.listeners.setdefault(js_to_string(etype), []).append(fn)

    def _remove_listener(self, etype="", fn=None, *_opts):
        lst = self.listeners.get(js_to_string(etype), [])
        if fn in lst:
            lst.remove(fn)

    def dispatch(self, etype: str, init: Optional[dict] = None, interp=None) -> Event:
        """Fire an event at this element, bubbling to ancestors. ``interp``
        defaults to the document's bound interpreter."""
        interp = interp or (self.document.interp if self.document else None)
        ev = Event(etype, self, init)
        cur = self
        while cur is not None:
            ev["currentTarget"] = cur
            handler = dict.get(cur, "on" + etype)
            for fn in ([handler] if handler not in (None, UNDEFINED) else []) + list(
                cur.listeners.get(etype, [])
            ):
                if interp is None:
                    raise RuntimeError("dispatch needs an interpreter")
                interp.ops = 0
                interp.call_function(fn, [ev], cur)
                if ev.get("propagationStopped"):
                    return ev
            cur = cur.parent
        return ev

    def _dispatch_js(self, ev):
        etype = js_to_string(ev.get("type", "")) if isinstance(ev, JSObject) else js_to_string(ev)
        return self.dispatch(etype)

    def _rect(self):
        r = JSObject()
        for k, v in (("left", 0.0), ("top", 0.0), ("right", 800.0), ("bottom", 600.0),
                     ("width", 800.0), ("height", 600.0), ("x", 0.0), ("y", 0.0)):
            r[k] = v
        return r

    def _identity_ctm(self):
        """SVG screen CTM: identity (no layout engine), so client
        coordinates == SVG user coordinates in the shim."""
        m = JSObject()
        m["inverse"] = lambda: m
        return m

    def __repr__(self):
        ident = "#" + self.attrs["id"] if "id" in self.attrs else ""
        return f"<{self.tag}{ident}>"


# -------------------------------------------------------------------------------
# selector matching: compound chains with descendant (space) and child (>)
# combinators; compounds support tag, #id, .class, [attr], [attr="v"]
# -------------------------------------------------------------------------------
_COMPOUND_RE = re.compile(
    r"([a-zA-Z][\w-]*|\*)?((?:[#.][\w-]+|\[[^\]]+\])*)$"
)
_PART_RE = re.compile(r"[#.][\w-]+|\[[^\]]+\]")


def _matches_compound(el: Element, compound: str) -> bool:
    m = _COMPOUND_RE.match(compound)
    if not m:
        return False
    tag, rest = m.group(1), m.group(2) or ""
    if tag and tag != "*" and el.tag != tag.lower():
        return False
    for part in _PART_RE.findall(rest):
        if part.startswith("#"):
            if el.attrs.get("id") != part[1:]:
                return False
        elif part.startswith("."):
            if part[1:] not in el._classes():
                return False
        else:  # [attr] or [attr="v"] / [attr='v']
            inner = part[1:-1]
            if "=" in inner:
                name, _, val = inner.partition("=")
                val = val.strip("\"'")
                if el.attrs.get(name.strip()) != val:
                    return False
            else:
                if inner.strip() not in el.attrs:
                    return False
    return True


def _matches_compound_chain(el: Element, sel: str) -> bool:
    # tokenize into compounds + combinators (right to left)
    toks: List[str] = []
    for piece in re.split(r"(\s*>\s*|\s+)", sel.strip()):
        piece = piece or ""
        if not piece.strip():
            if piece:
                toks.append(" ")
            continue
        if piece.strip() == ">":
            toks.append(">")
        else:
            toks.append(piece.strip())
    # collapse: [compound, comb, compound, ...]
    chain = [t for t in toks if t != " " or True]
    # normalize: remove consecutive spaces
    norm: List[str] = []
    for t in chain:
        if t == " " and (not norm or norm[-1] in (" ", ">")):
            continue
        norm.append(t)
    while norm and norm[-1] in (" ", ">"):
        norm.pop()
    if not norm:
        return False
    if not _matches_compound(el, norm[-1]):
        return False
    pos = len(norm) - 2
    cur = el
    while pos >= 0:
        comb = norm[pos]
        compound = norm[pos - 1]
        if comb == ">":
            cur = cur.parent
            if cur is None or not _matches_compound(cur, compound):
                return False
        else:  # descendant
            cur = cur.parent
            while cur is not None and not _matches_compound(cur, compound):
                cur = cur.parent
            if cur is None:
                return False
        pos -= 2
    return True


# -------------------------------------------------------------------------------
# HTML parsing / serialization
# -------------------------------------------------------------------------------
class _TreeBuilder(HTMLParser):
    def __init__(self, document: Optional["Document"]):
        super().__init__(convert_charrefs=True)
        self.document = document
        self.root = Element("#fragment", document)
        self.stack = [self.root]
        self.scripts: List[str] = []  # script bodies, in document order
        self._in_script = False
        self._script_buf: List[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            self._in_script = True
            self._script_buf = []
            return
        el = Element(tag, self.document)
        for name, value in attrs:
            el._set_attribute(name, value if value is not None else "")
        self.stack[-1]._append_child(el)
        if tag.lower() not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        if tag == "script":
            return
        el = Element(tag, self.document)
        for name, value in attrs:
            el._set_attribute(name, value if value is not None else "")
        self.stack[-1]._append_child(el)

    def handle_endtag(self, tag):
        if tag == "script":
            self._in_script = False
            self.scripts.append("".join(self._script_buf))
            return
        # pop to matching tag (tolerates misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag.lower():
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self._in_script:
            self._script_buf.append(data)
            return
        if data:
            self.stack[-1]._append_child(TextNode(data))


def parse_fragment(html: str, document: Optional["Document"] = None):
    b = _TreeBuilder(document)
    b.feed(html)
    b.close()
    nodes = list(b.root.child_nodes)
    for n in nodes:
        if isinstance(n, (Element, TextNode)):
            n.parent = None
    return nodes


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def serialize(node) -> str:
    if isinstance(node, TextNode):
        return _escape(node.get("textContent", ""))
    if not isinstance(node, Element):
        return ""
    attrs = "".join(f' {k}="{v}"' for k, v in node.attrs.items())
    if node.tag in VOID_ELEMENTS:
        return f"<{node.tag}{attrs}>"
    inner = "".join(serialize(c) for c in node.child_nodes)
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


class Document(Element):
    """The document: root element + creation/lookup methods + the scripts
    extracted at parse time (executed by the browser, not by innerHTML —
    matching real DOM semantics)."""

    def __init__(self):
        super().__init__("#document", None)
        self.document = self
        self.interp = None  # bound by HeadlessBrowser
        self.scripts: List[str] = []
        self["createElement"] = lambda tag="div": Element(js_to_string(tag), self)
        self["createElementNS"] = lambda ns="", tag="g": Element(js_to_string(tag), self)
        self["createTextNode"] = lambda text="": TextNode(js_to_string(text))
        self["getElementById"] = self._by_id
        self.accessors["body"] = (lambda: self._first_tag("body"), None)
        self.accessors["head"] = (lambda: self._first_tag("head"), None)
        self.accessors["documentElement"] = (lambda: self._first_tag("html"), None)

    def _by_id(self, el_id=""):
        el_id = js_to_string(el_id)
        for el in self.iter_tree():
            if el.attrs.get("id") == el_id:
                return el
        return None

    def _first_tag(self, tag: str):
        for el in self.iter_tree():
            if el.tag == tag:
                return el
        return None


def parse_html(html: str) -> Document:
    doc = Document()
    b = _TreeBuilder(doc)
    b.feed(html)
    b.close()
    for n in list(b.root.child_nodes):
        doc._append_child(n)
    doc.scripts = b.scripts
    return doc
