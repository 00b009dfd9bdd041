# SPDX-License-Identifier: Apache-2.0
"""mjs JavaScript interpreter tests (utils/mjs.py): language semantics,
stdlib surface, regex translation, op budget, and — the point — the
constructs the reference's shipped script samples use
(samples/pipelines/dynamic/voice-weather-open-meteo.js patterns)."""

import pytest

from streamkit_tpu.utils.mjs import (
    UNDEFINED,
    JSError,
    JSInterpreter,
    JSTimeout,
    to_python,
)


def run(src, fn=None, *args):
    it = JSInterpreter()
    it.run(src)
    if fn:
        return to_python(it.call(fn, *args))
    return it


def test_arithmetic_and_coercion():
    it = JSInterpreter()
    assert to_python(it.run("1 + 2 * 3")) == 7
    assert to_python(it.run("'a' + 1")) == "a1"
    assert to_python(it.run("'5' * '2'")) == 10
    assert to_python(it.run("10 % 3")) == 1
    assert to_python(it.run("2 ** 8")) == 256
    assert to_python(it.run("7 / 2")) == 3.5


def test_equality_semantics():
    it = JSInterpreter()
    assert it.run("1 == '1'") is True
    assert it.run("1 === '1'") is False
    assert it.run("null == undefined") is True
    assert it.run("null === undefined") is False
    assert it.run("NaN === NaN") is False


def test_functions_closures_defaults_rest():
    src = """
    function make(base) {
      let count = 0;
      return function(step = 1, ...extra) {
        count += step + extra.length;
        return base + count;
      };
    }
    const f = make(100);
    var r1 = f();
    var r2 = f(5, 'x', 'y');
    """
    it = run(src)
    assert to_python(it.globals.get("r1")) == 101
    assert to_python(it.globals.get("r2")) == 108


def test_arrow_functions_and_array_methods():
    src = """
    const xs = [1, 2, 3, 4, 5];
    const out = xs.filter(x => x % 2 === 1).map(x => x * 10);
    const sum = xs.reduce((a, b) => a + b, 0);
    const found = xs.find(x => x > 3);
    """
    it = run(src)
    assert to_python(it.globals.get("out")) == [10, 30, 50]
    assert to_python(it.globals.get("sum")) == 15
    assert to_python(it.globals.get("found")) == 4


def test_objects_spread_optional_chaining():
    src = """
    const base = { a: 1, b: { c: 2 } };
    const merged = { ...base, d: 3 };
    const c = merged.b?.c;
    const missing = merged.x?.y;
    const viaIndex = merged['a'];
    """
    it = run(src)
    assert to_python(it.globals.get("merged")) == {"a": 1, "b": {"c": 2}, "d": 3}
    assert to_python(it.globals.get("c")) == 2
    assert it.globals.get("missing") is UNDEFINED
    assert to_python(it.globals.get("viaIndex")) == 1


def test_template_literals():
    src = """
    const name = 'world';
    const n = 41;
    const msg = `hello ${name}, ${n + 1} is the answer`;
    """
    it = run(src)
    assert to_python(it.globals.get("msg")) == "hello world, 42 is the answer"


def test_regex_replace_and_match():
    src = """
    function normalizeWhitespace(s) {
      return String(s || '').replace(/\\s+/g, ' ').trim();
    }
    var a = normalizeWhitespace('  hello   there\\n world  ');
    var m = 'card 4242-4242'.match(/(\\d+)-(\\d+)/);
    var first = m ? m[1] : null;
    """
    it = run(src)
    assert to_python(it.globals.get("a")) == "hello there world"
    assert to_python(it.globals.get("first")) == "4242"


def test_json_roundtrip_and_fenced_extraction():
    """The weather sample's tryExtractJsonObject pattern."""
    src = """
    function tryExtractJsonObject(text) {
      const raw = String(text || '').trim();
      if (!raw) return null;
      try { return JSON.parse(raw); } catch (_) {}
      const fence = raw.match(/```(?:json)?\\s*([\\s\\S]*?)\\s*```/i);
      if (fence && fence[1]) {
        try { return JSON.parse(fence[1]); } catch (_) {}
      }
      return null;
    }
    var direct = tryExtractJsonObject('{"a": 1}');
    var fenced = tryExtractJsonObject('prefix ```json\\n{"b": 2}\\n``` suffix');
    var bad = tryExtractJsonObject('nope');
    """
    it = run(src)
    assert to_python(it.globals.get("direct")) == {"a": 1}
    assert to_python(it.globals.get("fenced")) == {"b": 2}
    assert it.globals.get("bad") is None


def test_weather_sample_helpers():
    """Verbatim helper functions from voice-weather-open-meteo.js."""
    src = """
    function isFiniteNumber(value) {
      return typeof value === 'number' && Number.isFinite(value);
    }
    function spokenDegrees(value, unit) {
      if (!isFiniteNumber(value)) return null;
      const rounded = Math.round(value * 10) / 10;
      const u = unit === 'fahrenheit' ? 'Fahrenheit' : 'Celsius';
      return `${rounded} degrees ${u}`;
    }
    function clampInt(value, min, max, fallback) {
      const n = Number(value);
      if (!Number.isFinite(n)) return fallback;
      const i = Math.trunc(n);
      if (i < min) return min;
      if (i > max) return max;
      return i;
    }
    var d1 = spokenDegrees(21.37, 'celsius');
    var d2 = spokenDegrees('x', 'celsius');
    var c1 = clampInt('7.9', 0, 5, 3);
    var c2 = clampInt('abc', 0, 5, 3);
    """
    it = run(src)
    assert to_python(it.globals.get("d1")) == "21.4 degrees Celsius"
    assert it.globals.get("d2") is None
    assert to_python(it.globals.get("c1")) == 5
    assert to_python(it.globals.get("c2")) == 3


def test_conversation_slice_pattern():
    src = """
    let conversation = [];
    const MAX = 4;
    function pushConversation(role, content) {
      conversation.push({ role, content });
      if (conversation.length > MAX) {
        conversation = conversation.slice(conversation.length - MAX);
      }
    }
    for (let i = 0; i < 7; i++) pushConversation('user', 'm' + i);
    var n = conversation.length;
    var first = conversation[0].content;
    """
    it = run(src)
    assert to_python(it.globals.get("n")) == 4
    assert to_python(it.globals.get("first")) == "m3"


def test_try_catch_throw_finally():
    src = """
    var log = [];
    function f() {
      try {
        throw new Error('boom');
      } catch (e) {
        log.push('caught:' + e.message);
        return 'recovered';
      } finally {
        log.push('finally');
      }
    }
    var r = f();
    """
    it = run(src)
    assert to_python(it.globals.get("r")) == "recovered"
    assert to_python(it.globals.get("log")) == ["caught:boom", "finally"]


def test_switch_for_of_for_in():
    src = """
    var out = [];
    for (const x of [1, 2, 3]) out.push(x * 2);
    const obj = {a: 1, b: 2};
    for (const k in obj) out.push(k);
    function kindOf(v) {
      switch (typeof v) {
        case 'number': return 'num';
        case 'string': return 'str';
        default: return 'other';
      }
    }
    var k1 = kindOf(1), k2 = kindOf('x'), k3 = kindOf(null);
    """
    it = run(src)
    assert to_python(it.globals.get("out")) == [2, 4, 6, "a", "b"]
    assert to_python(it.globals.get("k1")) == "num"
    assert to_python(it.globals.get("k2")) == "str"
    assert to_python(it.globals.get("k3")) == "other"


def test_string_methods():
    it = run(
        """
        var a = ' Padded '.trim().toLowerCase();
        var b = 'a,b,,c'.split(',');
        var c = 'hello'.slice(1, 3);
        var d = 'abc'.includes('b');
        var e = 'x'.padStart(3, '0');
        var f = 'a-b-c'.replaceAll('-', '_');
        """
    )
    assert to_python(it.globals.get("a")) == "padded"
    assert to_python(it.globals.get("b")) == ["a", "b", "", "c"]
    assert to_python(it.globals.get("c")) == "el"
    assert it.globals.get("d") is True
    assert to_python(it.globals.get("e")) == "00x"
    assert to_python(it.globals.get("f")) == "a_b_c"


def test_host_function_bridge():
    it = JSInterpreter()
    calls = []

    def fetch(url, opts=None):
        calls.append(to_python(url))
        return '{"ok": true}'

    it.set_global("fetch", fetch)
    it.run(
        """
        function process(packet) {
          const body = fetch('https://example.com/api');
          const data = JSON.parse(body);
          return data.ok ? 'yes' : 'no';
        }
        """
    )
    assert to_python(it.call("process", None)) == "yes"
    assert calls == ["https://example.com/api"]


def test_op_budget_stops_infinite_loop():
    it = JSInterpreter(op_budget=50_000)
    with pytest.raises(JSTimeout):
        it.run("while (true) { var x = 1; }")


def test_nullish_and_logical_assign():
    it = run(
        """
        var a = null ?? 'dflt';
        var b = 0 ?? 'nope';
        var c = null; c ??= 5;
        var d = ''; d ||= 'fallback';
        """
    )
    assert to_python(it.globals.get("a")) == "dflt"
    assert to_python(it.globals.get("b")) == 0
    assert to_python(it.globals.get("c")) == 5
    assert to_python(it.globals.get("d")) == "fallback"


def test_sort_and_join():
    it = run("var r = [3, 1, 10, 2].sort((a, b) => a - b).join('-');")
    assert to_python(it.globals.get("r")) == "1-2-3-10"


def test_number_formatting():
    it = run(
        """
        var a = (1.23456).toFixed(2);
        var b = String(1.5);
        var c = String(3);
        var d = parseInt('42px');
        var e = parseFloat('3.14xyz');
        """
    )
    assert to_python(it.globals.get("a")) == "1.23"
    assert to_python(it.globals.get("b")) == "1.5"
    assert to_python(it.globals.get("c")) == "3"
    assert to_python(it.globals.get("d")) == 42
    assert to_python(it.globals.get("e")) == 3.14


def test_reference_weather_script_parses_and_helpers_run():
    """The FULL 534-line reference sample must parse and its pure helpers
    must execute (fetch-dependent paths are exercised via a stub)."""
    import os

    path = "/root/reference/samples/pipelines/dynamic/voice-weather-open-meteo.js"
    if not os.path.exists(path):
        pytest.skip("reference sample not available")
    src = open(path, encoding="utf-8").read()
    it = JSInterpreter(op_budget=20_000_000)
    it.set_global("fetch", lambda url, opts=None: '{"results": []}')
    it.set_global("getSecret", lambda name: "")
    it.run(src)  # must parse + run top-level without error
    # exercise a pure helper defined by the script
    assert to_python(it.call("normalizeWhitespace", "  a   b  ")) == "a b"


# ---------------------------------------------------------------------------
# round-3 language extensions: destructuring, classes, accessors, Promise,
# Map/Set, `this` binding — the constructs the web UI script (and modern
# QuickJS user scripts, script.rs:408-693) rely on.
# ---------------------------------------------------------------------------
def test_destructuring_declarations():
    it = JSInterpreter()
    assert to_python(it.run("const {a, b} = {a:1, b:2}; a + b")) == 3
    assert to_python(it.run("const [x, , y] = [1, 2, 3]; x + y")) == 4
    assert to_python(it.run("const {p: {q}} = {p: {q: 7}}; q")) == 7
    assert to_python(it.run("const {m = 5, n} = {n: 1}; m + n")) == 6
    assert to_python(it.run("const {a, ...rest} = {a:1, b:2, c:3}; rest.b + rest.c")) == 5
    assert to_python(it.run("const [h, ...t] = [1,2,3]; t.length")) == 2
    assert to_python(it.run("const {done, value: v} = {done:false, value:9}; v")) == 9


def test_destructuring_params_and_forof():
    assert run("function f({a, b=10}) { return a + b }", "f", {"a": 1}) == 11
    it = JSInterpreter()
    assert (
        to_python(it.run("let s = 0; for (const [k, v] of Object.entries({x:1, y:2})) s += v; s"))
        == 3
    )


def test_this_binding_in_methods():
    it = JSInterpreter()
    assert to_python(it.run("const o = {v: 3, m() { return this.v }}; o.m()")) == 3
    # arrows capture lexical `this`
    assert (
        to_python(it.run("const o = {v: 5, m() { const f = () => this.v; return f() }}; o.m()"))
        == 5
    )
    # detached method loses `this` (JS semantics)
    assert to_python(it.run("const o = {v:1, m(){ return this === undefined }}; const f = o.m; f()")) is True


def test_classes():
    it = JSInterpreter()
    src = """
    class Animal {
        legs = 4;
        constructor(name) { this.name = name }
        get label() { return this.name + '/' + this.legs }
        speak() { return 'generic' }
        static kind() { return 'animal' }
    }
    class Dog extends Animal {
        constructor() { super('dog') }
        speak() { return super.speak() + ':woof' }
    }
    const d = new Dog();
    """
    it.run(src)
    assert to_python(it.run("d.label")) == "dog/4"
    assert to_python(it.run("d.speak()")) == "generic:woof"
    assert to_python(it.run("Animal.kind()")) == "animal"
    assert to_python(it.run("d instanceof Dog && d instanceof Animal")) is True
    assert to_python(it.run("new Animal('cat') instanceof Dog")) is False


def test_class_setters_and_chaining():
    it = JSInterpreter()
    assert (
        to_python(
            it.run(
                "class A { set v(x) { this._v = x * 2 } get v() { return this._v } }"
                " const a = new A(); a.v = 4; a.v"
            )
        )
        == 8
    )
    assert (
        to_python(
            it.run("class C { n = 0; inc() { this.n++; return this } } new C().inc().inc().n")
        )
        == 2
    )


def test_object_literal_accessors():
    it = JSInterpreter()
    assert (
        to_python(
            it.run(
                "const o = {_v: 2, get x() { return this._v * 2 }, set x(v) { this._v = v }};"
                " o.x = 5; o.x"
            )
        )
        == 10
    )


def test_promises_sync_resolution():
    it = JSInterpreter()
    assert to_python(it.run("let r; new Promise(res => res(5)).then(v => { r = v }); r")) == 5
    assert to_python(it.run("let s; Promise.resolve(2).then(v => v * 3).then(v => { s = v }); s")) == 6
    assert (
        to_python(it.run("let t; Promise.all([Promise.resolve(1), 2]).then(v => { t = v[0] + v[1] }); t"))
        == 3
    )
    # rejection → .catch
    assert (
        to_python(it.run("let e; Promise.reject('boom').catch(r => { e = r }); e")) == "boom"
    )


def test_async_functions_return_promises():
    it = JSInterpreter()
    assert to_python(it.run("async function f() { return 4 } await f() + 1")) == 5
    assert to_python(it.run("let out; (async () => 7)().then(v => { out = v }); out")) == 7
    # async throw → await rethrows (catchable)
    src = "async function g() { throw 'bad' } let m; try { await g() } catch (e) { m = e.message || e } m"
    assert to_python(it.run(src)) == "bad"


def test_await_pending_promise_pumps_embedder_loop():
    it = JSInterpreter()
    settle = []
    it.run("let p = new Promise((res) => { globalThis._res = res }); ")
    resolver = it.globals.get("globalThis")["_res"]

    def pump():
        # one pump tick settles the promise (models a delivered WS event)
        if not settle:
            settle.append(1)
            it.call_function(resolver, [42.0], UNDEFINED)
        return True

    it.pending_pump = pump
    assert to_python(it.run("await p")) == 42


def test_await_pending_without_loop_raises():
    it = JSInterpreter()
    with pytest.raises(JSError):
        it.run("await new Promise(() => {})")


def test_map_and_set():
    it = JSInterpreter()
    assert to_python(it.run("const m = new Map(); m.set('a', 1).set('b', 2); m.get('a') + m.size")) == 3
    assert to_python(it.run("const s = new Set([1, 2, 2, 3]); s.size")) == 3
    assert to_python(it.run("const m2 = new Map([['x', 1], ['y', 2]]); let t = 0; for (const [k, v] of m2) t += v; t")) == 3
    assert to_python(it.run("const s2 = new Set(); s2.add(5); s2.has(5) && !s2.has(6)")) is True
    assert to_python(it.run("Array.from(new Set(['a','b'])).length")) == 2
    assert to_python(it.run("new Map() instanceof Map && new Set() instanceof Set")) is True


def test_function_bind():
    it = JSInterpreter()
    assert (
        to_python(it.run("function f(a, b) { return this.x + a + b } const g = f.bind({x: 1}, 2); g(3)"))
        == 6
    )


def test_new_binds_tighter_than_member_chain():
    it = JSInterpreter()
    assert to_python(it.run("class A { m() { return 9 } } new A().m()")) == 9
