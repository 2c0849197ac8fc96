"""Built-in chat webui served at GET / — the analog of the reference's
React SPA (`tools/server/webui/src`): conversation sidebar with local
persistence, SSE-streamed chat, markdown + code rendering, a settings
dialog exposing the full sampler surface (mirrors `Config.ts`
CONFIG_DEFAULT), image attachments for vision models, message edit /
regenerate, stop button, tokens/s readout.

Single static page, zero external assets (this environment and many
deployments are egress-free), dependency-free vanilla JS.  Speaks the
same OpenAI-compatible API as the reference webui (`/v1/chat/completions`
with `stream: true`, `/props` for the model name).
"""

WEBUI_HTML = r"""<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>llama.cpp-gfx906 → TPU</title>
<style>
:root {
  --bg: #0f1115; --panel: #171a21; --panel2: #1d2129; --line: #2a2f3a;
  --fg: #e6e9ef; --dim: #8b93a3; --acc: #3fb97c; --acc2: #2a8f5f;
  --user: #96e0c8; --err: #e07a7a; --code: #12151b;
}
* { box-sizing: border-box; }
body { margin: 0; font: 15px/1.55 system-ui, -apple-system, sans-serif;
       background: var(--bg); color: var(--fg); height: 100vh; display: flex; }
button { font: inherit; cursor: pointer; border: 0; border-radius: 6px; }
textarea, input, select { font: inherit; color: var(--fg);
  background: var(--panel2); border: 1px solid var(--line); border-radius: 6px; }

#sidebar { width: 250px; min-width: 250px; background: var(--panel);
  border-right: 1px solid var(--line); display: flex; flex-direction: column; }
#sidebar.hidden { display: none; }
#sidebar header { padding: .8rem; display: flex; gap: .5rem; }
#newchat { flex: 1; background: var(--acc); color: #04140c; padding: .45rem; font-weight: 600; }
#convs { flex: 1; overflow-y: auto; padding: .3rem; }
.conv { padding: .45rem .6rem; border-radius: 6px; cursor: pointer; display: flex;
  align-items: center; gap: .4rem; color: var(--dim); }
.conv.active { background: var(--panel2); color: var(--fg); }
.conv span { flex: 1; overflow: hidden; text-overflow: ellipsis; white-space: nowrap; }
.conv button { background: none; color: var(--dim); padding: 0 .2rem; visibility: hidden; }
.conv:hover button { visibility: visible; }
#sidefoot { padding: .6rem .8rem; color: var(--dim); font-size: .8rem;
  border-top: 1px solid var(--line); }

#main { flex: 1; display: flex; flex-direction: column; min-width: 0; }
#topbar { display: flex; align-items: center; gap: .6rem; padding: .6rem 1rem;
  border-bottom: 1px solid var(--line); background: var(--panel); }
#topbar h1 { font-size: 1rem; margin: 0; flex: 1; font-weight: 600; }
#topbar .dim { color: var(--dim); font-weight: 400; font-size: .85rem; }
.iconbtn { background: var(--panel2); color: var(--fg); padding: .35rem .6rem;
  border: 1px solid var(--line); }

#chat { flex: 1; overflow-y: auto; padding: 1rem; scroll-behavior: smooth; }
.msg { max-width: 860px; margin: 0 auto .9rem; padding: .7rem .9rem;
  border-radius: 10px; position: relative; }
.msg.user { background: var(--panel2); border: 1px solid var(--line); }
.msg.assistant { background: transparent; }
.msg .role { font-size: .75rem; color: var(--dim); margin-bottom: .25rem;
  text-transform: uppercase; letter-spacing: .06em; }
.msg.user .role { color: var(--user); }
.msg .tools { position: absolute; top: .4rem; right: .5rem; display: none; gap: .3rem; }
.msg:hover .tools { display: flex; }
.msg .tools button { background: var(--panel); color: var(--dim);
  border: 1px solid var(--line); padding: .1rem .45rem; font-size: .75rem; }
.msg img.attach { max-width: 220px; border-radius: 8px; display: block; margin: .4rem 0; }
.stats { font-size: .75rem; color: var(--dim); margin-top: .3rem; }
.cursor::after { content: "▌"; animation: blink 1s steps(1) infinite; color: var(--acc); }
@keyframes blink { 50% { opacity: 0; } }

.md pre { background: var(--code); border: 1px solid var(--line); border-radius: 8px;
  padding: .7rem .8rem; overflow-x: auto; position: relative; }
.md pre .copy { position: absolute; top: .35rem; right: .4rem; font-size: .7rem;
  background: var(--panel2); color: var(--dim); padding: .1rem .4rem;
  border: 1px solid var(--line); }
.md code { background: var(--code); padding: .1em .35em; border-radius: 4px;
  font: .88em ui-monospace, monospace; }
.md pre code { background: none; padding: 0; display: block; }
.md table { border-collapse: collapse; margin: .5rem 0; }
.md th, .md td { border: 1px solid var(--line); padding: .25rem .6rem; }
.md blockquote { border-left: 3px solid var(--acc2); margin: .4rem 0;
  padding: .1rem .8rem; color: var(--dim); }
.md h1,.md h2,.md h3 { margin: .7rem 0 .35rem; }
.md p { margin: .4rem 0; }
.md ul, .md ol { margin: .3rem 0 .3rem 1.4rem; padding: 0; }
.think { color: var(--dim); font-style: italic; border-left: 3px solid var(--line);
  padding-left: .8rem; margin: .3rem 0; white-space: pre-wrap; }

#inputbar { border-top: 1px solid var(--line); background: var(--panel); padding: .8rem 1rem; }
#inputrow { max-width: 860px; margin: 0 auto; display: flex; gap: .5rem; align-items: flex-end; }
#prompt { flex: 1; resize: none; padding: .6rem .8rem; max-height: 180px; min-height: 42px; }
#send { background: var(--acc); color: #04140c; padding: .6rem 1.1rem; font-weight: 600; }
#send.stop { background: var(--err); color: #1b0c0c; }
#attach { background: var(--panel2); color: var(--fg); border: 1px solid var(--line);
  padding: .55rem .7rem; }
#attachments { max-width: 860px; margin: .4rem auto 0; display: flex; gap: .5rem; }
#attachments img { height: 52px; border-radius: 6px; border: 1px solid var(--line); }

dialog { background: var(--panel); color: var(--fg); border: 1px solid var(--line);
  border-radius: 12px; max-width: 560px; width: 92%; padding: 1.1rem 1.3rem; }
dialog::backdrop { background: rgba(0,0,0,.55); }
dialog h2 { margin: 0 0 .7rem; font-size: 1.05rem; }
.field { display: flex; align-items: center; gap: .6rem; margin: .45rem 0; }
.field label { width: 180px; color: var(--dim); font-size: .85rem; }
.field input, .field textarea { flex: 1; padding: .3rem .5rem; }
.cols { display: grid; grid-template-columns: 1fr 1fr; gap: 0 1.2rem; }
dialog footer { display: flex; justify-content: flex-end; gap: .6rem; margin-top: .9rem; }
.secondary { background: var(--panel2); color: var(--fg); border: 1px solid var(--line);
  padding: .45rem .9rem; }
.primary { background: var(--acc); color: #04140c; padding: .45rem .9rem; font-weight: 600; }
details.sampler { margin: .5rem 0; }
details.sampler summary { cursor: pointer; color: var(--dim); }
</style>
</head>
<body>
<aside id="sidebar">
  <header><button id="newchat">+ New chat</button></header>
  <nav id="convs"></nav>
  <div id="sidefoot">conversations stay in this browser (localStorage)</div>
</aside>
<div id="main">
  <div id="topbar">
    <button class="iconbtn" id="togglesb" title="Toggle sidebar">☰</button>
    <h1>llama.cpp-gfx906 → TPU <span class="dim" id="model"></span></h1>
    <span class="dim" id="speed"></span>
    <button class="iconbtn" id="settings">⚙ Settings</button>
  </div>
  <div id="chat"></div>
  <div id="inputbar">
    <div id="attachments"></div>
    <div id="inputrow">
      <button id="attach" title="Attach image (vision models)">📎</button>
      <textarea id="prompt" rows="1" placeholder="Send a message…  (Enter to send, Shift+Enter for newline)"></textarea>
      <button id="send">Send</button>
    </div>
  </div>
</div>
<input type="file" id="file" accept="image/*" multiple hidden>

<dialog id="dlg">
  <h2>Settings</h2>
  <div class="field"><label>API key</label><input id="s_apiKey" type="password"></div>
  <div class="field"><label>System message</label><textarea id="s_system" rows="2"></textarea></div>
  <div class="cols">
    <div class="field"><label>temperature</label><input id="s_temperature" type="number" step="0.05"></div>
    <div class="field"><label>max_tokens (-1 = ∞)</label><input id="s_max_tokens" type="number" step="1"></div>
    <div class="field"><label>top_k</label><input id="s_top_k" type="number" step="1"></div>
    <div class="field"><label>top_p</label><input id="s_top_p" type="number" step="0.01"></div>
    <div class="field"><label>min_p</label><input id="s_min_p" type="number" step="0.01"></div>
    <div class="field"><label>typical_p</label><input id="s_typical_p" type="number" step="0.01"></div>
  </div>
  <details class="sampler"><summary>Penalties / DRY / XTC / dynatemp</summary>
  <div class="cols">
    <div class="field"><label>repeat_penalty</label><input id="s_repeat_penalty" type="number" step="0.01"></div>
    <div class="field"><label>repeat_last_n</label><input id="s_repeat_last_n" type="number" step="1"></div>
    <div class="field"><label>presence_penalty</label><input id="s_presence_penalty" type="number" step="0.01"></div>
    <div class="field"><label>frequency_penalty</label><input id="s_frequency_penalty" type="number" step="0.01"></div>
    <div class="field"><label>dry_multiplier</label><input id="s_dry_multiplier" type="number" step="0.05"></div>
    <div class="field"><label>dry_base</label><input id="s_dry_base" type="number" step="0.05"></div>
    <div class="field"><label>xtc_probability</label><input id="s_xtc_probability" type="number" step="0.01"></div>
    <div class="field"><label>xtc_threshold</label><input id="s_xtc_threshold" type="number" step="0.01"></div>
    <div class="field"><label>dynatemp_range</label><input id="s_dynatemp_range" type="number" step="0.05"></div>
    <div class="field"><label>dynatemp_exponent</label><input id="s_dynatemp_exponent" type="number" step="0.05"></div>
  </div>
  </details>
  <div class="field"><label>show thoughts while streaming</label><input id="s_showThink" type="checkbox" style="flex:0"></div>
  <div class="field"><label>custom JSON (merged into request)</label><textarea id="s_custom" rows="2" placeholder='{"seed": 42}'></textarea></div>
  <footer>
    <button class="secondary" id="s_reset">Reset to defaults</button>
    <button class="secondary" id="s_cancel">Cancel</button>
    <button class="primary" id="s_save">Save</button>
  </footer>
</dialog>

<script>
"use strict";
// ---------- config (mirrors the reference webui's Config.ts defaults) ----
const DEFAULTS = {
  apiKey: "", system: "", temperature: 0.8, max_tokens: -1,
  top_k: 40, top_p: 0.95, min_p: 0.05, typical_p: 1.0,
  repeat_penalty: 1.0, repeat_last_n: 64, presence_penalty: 0.0,
  frequency_penalty: 0.0, dry_multiplier: 0.0, dry_base: 1.75,
  xtc_probability: 0.0, xtc_threshold: 0.1,
  dynatemp_range: 0.0, dynatemp_exponent: 1.0,
  showThink: true, custom: "",
};
let cfg = Object.assign({}, DEFAULTS,
  JSON.parse(localStorage.getItem("lcg.cfg") || "{}"));

// ---------- conversation store (localStorage) -----------------------------
function load() { return JSON.parse(localStorage.getItem("lcg.convs") || "[]"); }
function store(cs) { localStorage.setItem("lcg.convs", JSON.stringify(cs)); }
let convs = load();
let curId = localStorage.getItem("lcg.cur") || null;
function cur() { return convs.find(c => c.id === curId); }
function newConv() {
  const c = { id: String(Date.now()), title: "New chat", messages: [] };
  convs.unshift(c); curId = c.id; persist(); render(); renderConvs();
}
function persist() { store(convs); localStorage.setItem("lcg.cur", curId || ""); }

// ---------- tiny markdown renderer (no external deps) ---------------------
function esc(s) { return s.replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;"); }
function inline(s) {
  s = esc(s);
  s = s.replace(/`([^`]+)`/g, (_, c) => "<code>" + c + "</code>");
  s = s.replace(/\*\*([^*]+)\*\*/g, "<b>$1</b>");
  s = s.replace(/(^|\W)\*([^*\s][^*]*)\*/g, "$1<i>$2</i>");
  s = s.replace(/\[([^\]]+)\]\((https?:[^)\s]+)\)/g,
    '<a href="$2" target="_blank" rel="noopener">$1</a>');
  return s;
}
function renderMd(src) {
  const out = []; const lines = src.split("\n");
  let i = 0, list = null, para = [];
  function flushPara() {
    if (para.length) { out.push("<p>" + inline(para.join("\n")).replace(/\n/g, "<br>") + "</p>"); para = []; }
  }
  function flushList() { if (list) { out.push(list === "ul" ? "</ul>" : "</ol>"); list = null; } }
  while (i < lines.length) {
    const l = lines[i];
    const fence = l.match(/^```(\w*)/);
    if (fence) {
      flushPara(); flushList();
      const body = [];
      i++;
      while (i < lines.length && !/^```/.test(lines[i])) body.push(lines[i++]);
      i++;
      out.push('<pre><button class="copy">copy</button><code class="lang-' +
               esc(fence[1]) + '">' + esc(body.join("\n")) + "</code></pre>");
      continue;
    }
    const h = l.match(/^(#{1,3})\s+(.*)/);
    if (h) { flushPara(); flushList(); out.push("<h" + h[1].length + ">" + inline(h[2]) + "</h" + h[1].length + ">"); i++; continue; }
    if (/^\s*>\s?/.test(l)) {
      flushPara(); flushList();
      const q = [];
      while (i < lines.length && /^\s*>\s?/.test(lines[i])) q.push(lines[i++].replace(/^\s*>\s?/, ""));
      out.push("<blockquote>" + renderMd(q.join("\n")) + "</blockquote>"); continue;
    }
    const ul = l.match(/^\s*[-*]\s+(.*)/), ol = l.match(/^\s*\d+[.)]\s+(.*)/);
    if (ul || ol) {
      flushPara();
      const want = ul ? "ul" : "ol";
      if (list !== want) { flushList(); out.push(want === "ul" ? "<ul>" : "<ol>"); list = want; }
      out.push("<li>" + inline((ul || ol)[1]) + "</li>"); i++; continue;
    }
    if (/^\s*\|.*\|\s*$/.test(l) && i + 1 < lines.length && /^\s*\|[\s:|-]+\|\s*$/.test(lines[i + 1])) {
      flushPara(); flushList();
      const cells = r => r.trim().replace(/^\||\|$/g, "").split("|").map(c => inline(c.trim()));
      out.push("<table><tr>" + cells(l).map(c => "<th>" + c + "</th>").join("") + "</tr>");
      i += 2;
      while (i < lines.length && /^\s*\|.*\|\s*$/.test(lines[i]))
        out.push("<tr>" + cells(lines[i++]).map(c => "<td>" + c + "</td>").join("") + "</tr>");
      out.push("</table>"); continue;
    }
    if (/^\s*$/.test(l)) { flushPara(); flushList(); i++; continue; }
    para.push(l); i++;
  }
  flushPara(); flushList();
  return out.join("\n");
}
// <think> blocks render dimmed (reference: showThoughtInProgress)
function renderContent(text) {
  const parts = text.split(/<think>|<\/think>/);
  let html = "";
  for (let j = 0; j < parts.length; j++) {
    if (j % 2 === 1) { if (cfg.showThink) html += '<div class="think">' + esc(parts[j]) + "</div>"; }
    else html += renderMd(parts[j]);
  }
  return html;
}

// ---------- chat rendering -------------------------------------------------
const chatEl = document.getElementById("chat");
function msgHtml(m, idx) {
  const div = document.createElement("div");
  div.className = "msg " + m.role;
  let tools = '<div class="tools">';
  if (m.role === "user") tools += '<button data-a="edit" data-i="' + idx + '">edit</button>';
  if (m.role === "assistant") tools += '<button data-a="regen" data-i="' + idx + '">regen</button>';
  tools += '<button data-a="copy" data-i="' + idx + '">copy</button></div>';
  let imgs = "";
  (m.images || []).forEach(u => { imgs += '<img class="attach" src="' + u + '">'; });
  div.innerHTML = '<div class="role">' + m.role + "</div>" + tools + imgs +
    '<div class="md">' + renderContent(m.content) + "</div>" +
    (m.stats ? '<div class="stats">' + esc(m.stats) + "</div>" : "");
  return div;
}
function render() {
  chatEl.innerHTML = "";
  const c = cur();
  if (!c) return;
  c.messages.forEach((m, i) => chatEl.appendChild(msgHtml(m, i)));
  chatEl.scrollTop = chatEl.scrollHeight;
}
function renderConvs() {
  const nav = document.getElementById("convs");
  nav.innerHTML = "";
  convs.forEach(c => {
    const d = document.createElement("div");
    d.className = "conv" + (c.id === curId ? " active" : "");
    d.innerHTML = "<span>" + esc(c.title) + '</span><button title="rename">✎</button><button title="delete">🗑</button>';
    d.querySelector("span").onclick = () => { curId = c.id; persist(); render(); renderConvs(); };
    const [ren, del] = d.querySelectorAll("button");
    ren.onclick = () => { const t = prompt("Rename conversation", c.title); if (t) { c.title = t; persist(); renderConvs(); } };
    del.onclick = () => { convs = convs.filter(x => x.id !== c.id); if (curId === c.id) curId = convs[0]?.id || null; persist(); render(); renderConvs(); };
    nav.appendChild(d);
  });
}

// ---------- streaming ------------------------------------------------------
let aborter = null;
const sendBtn = document.getElementById("send");
function buildBody(messages) {
  const msgs = [];
  if (cfg.system) msgs.push({ role: "system", content: cfg.system });
  for (const m of messages) {
    if (m.images && m.images.length) {
      const content = m.images.map(u => ({ type: "image_url", image_url: { url: u } }));
      content.push({ type: "text", text: m.content });
      msgs.push({ role: m.role, content });
    } else msgs.push({ role: m.role, content: m.content });
  }
  const body = {
    messages: msgs, stream: true,
    temperature: +cfg.temperature, top_k: +cfg.top_k, top_p: +cfg.top_p,
    min_p: +cfg.min_p, typical_p: +cfg.typical_p,
    repeat_penalty: +cfg.repeat_penalty, repeat_last_n: +cfg.repeat_last_n,
    presence_penalty: +cfg.presence_penalty, frequency_penalty: +cfg.frequency_penalty,
    dry_multiplier: +cfg.dry_multiplier, dry_base: +cfg.dry_base,
    xtc_probability: +cfg.xtc_probability, xtc_threshold: +cfg.xtc_threshold,
    dynatemp_range: +cfg.dynatemp_range, dynatemp_exponent: +cfg.dynatemp_exponent,
  };
  if (+cfg.max_tokens > 0) body.max_tokens = +cfg.max_tokens;
  if (cfg.custom) { try { Object.assign(body, JSON.parse(cfg.custom)); } catch (e) {} }
  return body;
}
async function generate() {
  const c = cur();
  if (!c) return;
  const asst = { role: "assistant", content: "" };
  c.messages.push(asst); persist(); render();
  const node = chatEl.lastChild.querySelector(".md");
  node.classList.add("cursor");
  sendBtn.textContent = "Stop"; sendBtn.classList.add("stop");
  aborter = new AbortController();
  const t0 = performance.now();
  let nTok = 0;
  try {
    const headers = { "Content-Type": "application/json" };
    if (cfg.apiKey) headers["Authorization"] = "Bearer " + cfg.apiKey;
    const r = await fetch("v1/chat/completions", {
      method: "POST", headers, signal: aborter.signal,
      body: JSON.stringify(buildBody(c.messages.slice(0, -1))),
    });
    if (!r.ok) throw new Error("HTTP " + r.status + ": " + await r.text());
    const reader = r.body.getReader();
    const dec = new TextDecoder();
    let buf = "";
    for (;;) {
      const { done, value } = await reader.read();
      if (done) break;
      buf += dec.decode(value, { stream: true });
      const events = buf.split("\n\n"); buf = events.pop();
      for (const ev of events) {
        const line = ev.split("\n").find(l => l.startsWith("data: "));
        if (!line) continue;
        const data = line.slice(6);
        if (data === "[DONE]") continue;
        const js = JSON.parse(data);
        const delta = js.choices?.[0]?.delta?.content;
        if (delta) {
          asst.content += delta; nTok++;
          node.innerHTML = renderContent(asst.content);
          chatEl.scrollTop = chatEl.scrollHeight;
        }
      }
    }
    const dt = (performance.now() - t0) / 1000;
    asst.stats = nTok + " tokens · " + (nTok / dt).toFixed(1) + " tok/s";
    document.getElementById("speed").textContent = (nTok / dt).toFixed(1) + " tok/s";
  } catch (e) {
    if (e.name !== "AbortError") asst.content += "\n\n**error:** " + e.message;
  } finally {
    aborter = null;
    sendBtn.textContent = "Send"; sendBtn.classList.remove("stop");
    node.classList.remove("cursor");
    if (c.title === "New chat") {
      const u = c.messages.find(m => m.role === "user");
      if (u) c.title = u.content.slice(0, 40) || "Chat";
    }
    persist(); render(); renderConvs();
  }
}

// ---------- input ----------------------------------------------------------
const promptEl = document.getElementById("prompt");
let pendingImages = [];
function refreshAttach() {
  const a = document.getElementById("attachments");
  a.innerHTML = "";
  pendingImages.forEach((u, i) => {
    const img = document.createElement("img");
    img.src = u; img.title = "click to remove";
    img.onclick = () => { pendingImages.splice(i, 1); refreshAttach(); };
    a.appendChild(img);
  });
}
function send() {
  if (aborter) { aborter.abort(); return; }
  const text = promptEl.value.trim();
  if (!text && !pendingImages.length) return;
  if (!cur()) newConv();
  const m = { role: "user", content: text };
  if (pendingImages.length) m.images = pendingImages.slice();
  cur().messages.push(m);
  promptEl.value = ""; promptEl.style.height = "auto";
  pendingImages = []; refreshAttach();
  persist(); render();
  generate();
}
sendBtn.onclick = send;
promptEl.addEventListener("keydown", e => {
  if (e.key === "Enter" && !e.shiftKey) { e.preventDefault(); send(); }
});
promptEl.addEventListener("input", () => {
  promptEl.style.height = "auto";
  promptEl.style.height = Math.min(promptEl.scrollHeight, 180) + "px";
});
document.getElementById("attach").onclick = () => document.getElementById("file").click();
document.getElementById("file").onchange = e => {
  for (const f of e.target.files) {
    const rd = new FileReader();
    rd.onload = () => { pendingImages.push(rd.result); refreshAttach(); };
    rd.readAsDataURL(f);
  }
  e.target.value = "";
};

// message tools: edit / regen / copy / code-copy
chatEl.addEventListener("click", e => {
  if (e.target.classList.contains("copy")) {
    navigator.clipboard.writeText(e.target.nextElementSibling.textContent);
    e.target.textContent = "copied"; setTimeout(() => e.target.textContent = "copy", 1200);
    return;
  }
  const a = e.target.dataset.a;
  if (!a) return;
  const i = +e.target.dataset.i, c = cur();
  if (a === "copy") navigator.clipboard.writeText(c.messages[i].content);
  if (a === "edit") {
    const t = prompt("Edit message", c.messages[i].content);
    if (t !== null) { c.messages[i].content = t; c.messages.length = i + 1; persist(); render(); generate(); }
  }
  if (a === "regen") { c.messages.length = i; persist(); render(); generate(); }
});

// ---------- settings dialog ------------------------------------------------
const dlg = document.getElementById("dlg");
const FIELDS = ["apiKey", "temperature", "max_tokens", "top_k", "top_p", "min_p",
  "typical_p", "repeat_penalty", "repeat_last_n", "presence_penalty",
  "frequency_penalty", "dry_multiplier", "dry_base", "xtc_probability",
  "xtc_threshold", "dynatemp_range", "dynatemp_exponent", "custom"];
document.getElementById("settings").onclick = () => {
  for (const f of FIELDS) document.getElementById("s_" + f).value = cfg[f];
  document.getElementById("s_system").value = cfg.system;
  document.getElementById("s_showThink").checked = cfg.showThink;
  dlg.showModal();
};
document.getElementById("s_cancel").onclick = () => dlg.close();
document.getElementById("s_reset").onclick = () => {
  cfg = Object.assign({}, DEFAULTS);
  for (const f of FIELDS) document.getElementById("s_" + f).value = cfg[f];
  document.getElementById("s_system").value = "";
  document.getElementById("s_showThink").checked = cfg.showThink;
};
document.getElementById("s_save").onclick = () => {
  for (const f of FIELDS) cfg[f] = document.getElementById("s_" + f).value;
  cfg.system = document.getElementById("s_system").value;
  cfg.showThink = document.getElementById("s_showThink").checked;
  localStorage.setItem("lcg.cfg", JSON.stringify(cfg));
  dlg.close();
};
document.getElementById("newchat").onclick = newConv;
document.getElementById("togglesb").onclick = () =>
  document.getElementById("sidebar").classList.toggle("hidden");

// ---------- boot -----------------------------------------------------------
fetch("props").then(r => r.json()).then(p => {
  const name = (p.model_path || p.default_generation_settings?.model || "").split("/").pop();
  document.getElementById("model").textContent = name;
}).catch(() => {});
if (!convs.length) newConv(); else { if (!cur()) curId = convs[0].id; render(); renderConvs(); }
</script>
</body>
</html>
"""
