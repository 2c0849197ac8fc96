"""Minimal built-in chat webui served at GET / (reference: the Svelte
webui in tools/server/webui — here a single static page speaking the
same OpenAI-compatible API with SSE streaming)."""

WEBUI_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>llama.cpp-gfx906 → TPU</title>
<style>
  body { font-family: system-ui, sans-serif; max-width: 780px; margin: 2rem auto; padding: 0 1rem; background:#111; color:#eee; }
  #log { border: 1px solid #333; border-radius: 8px; padding: 1rem; min-height: 300px; white-space: pre-wrap; }
  .u { color: #8fd; margin-top: .8em; }
  .a { color: #eee; }
  form { display: flex; gap: .5rem; margin-top: 1rem; }
  input[type=text] { flex: 1; padding: .6rem; border-radius: 6px; border: 1px solid #444; background:#1a1a1a; color:#eee; }
  button { padding: .6rem 1.2rem; border-radius: 6px; border: 0; background: #2a6; color: white; cursor: pointer; }
  small { color: #888; }
</style>
</head>
<body>
<h2>llama.cpp-gfx906 → TPU <small id="model"></small></h2>
<div id="log"></div>
<form id="f">
  <input type="text" id="q" placeholder="Say something..." autofocus>
  <button>Send</button>
</form>
<script>
const log = document.getElementById('log');
const messages = [];
fetch('/v1/models').then(r => r.json()).then(d => {
  document.getElementById('model').textContent = d.data[0].id;
});
document.getElementById('f').addEventListener('submit', async (e) => {
  e.preventDefault();
  const q = document.getElementById('q');
  const text = q.value.trim();
  if (!text) return;
  q.value = '';
  messages.push({role: 'user', content: text});
  log.innerHTML += '<div class="u">&gt; ' + text.replace(/</g, '&lt;') + '</div>';
  const div = document.createElement('div');
  div.className = 'a';
  log.appendChild(div);
  const resp = await fetch('/v1/chat/completions', {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({messages, stream: true, max_tokens: 512}),
  });
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let acc = '', buf = '';
  for (;;) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    const lines = buf.split('\\n');
    buf = lines.pop();
    for (const ln of lines) {
      if (!ln.startsWith('data: ')) continue;
      const payload = ln.slice(6);
      if (payload === '[DONE]') continue;
      try {
        const delta = JSON.parse(payload).choices[0].delta;
        if (delta.content) { acc += delta.content; div.textContent = acc; }
      } catch {}
    }
  }
  messages.push({role: 'assistant', content: acc});
  window.scrollTo(0, document.body.scrollHeight);
});
</script>
</body>
</html>
"""
