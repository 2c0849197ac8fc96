" Fill-in-the-middle completion for the TPU llama server
" (compact analog of the reference's examples/llama.vim, which drives a
" FIM-capable model through the server's /infill endpoint).
"
" usage:
"   :source llama.vim
"   start the server with a FIM-capable model (codellama/qwen-coder/
"   starcoder lineage):  python -m llama_cpp_gfx906_tpu.server -m model.gguf
"   press <C-F> in insert or normal mode to request a completion for the
"   text around the cursor; the suggestion is inserted at the cursor.
"
" config (set before sourcing, all optional):
"   let g:llama_url       = 'http://127.0.0.1:8080/infill'
"   let g:llama_n_predict = 128
"   let g:llama_n_prefix  = 256   " lines of context before the cursor
"   let g:llama_n_suffix  = 64    " lines of context after the cursor

function! s:LlamaFim()
  let url   = get(g:, 'llama_url', 'http://127.0.0.1:8080/infill')
  let n_pre = get(g:, 'llama_n_prefix', 256)
  let n_suf = get(g:, 'llama_n_suffix', 64)

  let l = line('.')
  let c = col('.') - 1
  let cur = getline('.')

  " prefix = context lines above + the line up to the cursor
  let pre_lines = getline(max([1, l - n_pre]), l - 1)
  let prefix = join(pre_lines + [strpart(cur, 0, c)], "\n")
  " suffix = rest of the line + context lines below
  let suf_lines = getline(l + 1, min([line('$'), l + n_suf]))
  let suffix = join([strpart(cur, c)] + suf_lines, "\n")

  let payload = {
        \ 'input_prefix': prefix,
        \ 'input_suffix': suffix,
        \ 'n_predict': get(g:, 'llama_n_predict', 128),
        \ 'temperature': 0.1,
        \ 'stream': v:false }

  let cmd = 'curl -s -X POST -H "Content-Type: application/json" -d @- ' . url
  let response = system(cmd, json_encode(payload))
  if v:shell_error != 0
    echoerr 'llama.vim: server not reachable at ' . url
    return
  endif

  let content = json_decode(response).content
  if empty(content)
    echo 'llama.vim: empty completion'
    return
  endif

  " insert the completion at the cursor
  let lines = split(content, '\n', 1)
  let head = strpart(cur, 0, c) . lines[0]
  let tail = strpart(cur, c)
  if len(lines) == 1
    call setline(l, head . tail)
  else
    call setline(l, head)
    call append(l, lines[1:-2] + [lines[-1] . tail])
  endif
endfunction

command! LlamaFim call s:LlamaFim()
inoremap <C-F> <Esc>:LlamaFim<CR>a
nnoremap <C-F> :LlamaFim<CR>
