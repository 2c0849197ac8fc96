" Basic buffer-completion plugin for the TPU llama server
" (analog of the reference's examples/llm.vim against the same
" /completion endpoint this server exposes).
"
" usage:  :source llm.vim   then  :Llm  or <F2>  in any buffer.
" The whole buffer is sent as the prompt; the completion is inserted
" at the cursor line.

function! Llm()
  let url = get(g:, 'llm_url', 'http://127.0.0.1:8080/completion')

  let payload = {
        \ 'prompt': join(getline(1, '$'), "\n"),
        \ 'temperature': 0.7,
        \ 'top_k': 100,
        \ 'top_p': 0.9,
        \ 'repeat_penalty': 1.1,
        \ 'n_predict': 256,
        \ 'stop': ["\n\n\n"],
        \ 'stream': v:false }

  let cmd = 'curl -s -X POST -H "Content-Type: application/json" -d @- ' . url
  let response = system(cmd, json_encode(payload))
  if v:shell_error != 0
    echoerr 'llm.vim: server not reachable at ' . url
    return
  endif

  let content = json_decode(response).content
  let lines = split(content, '\n', 1)
  call setline(line('.'), [getline('.') . lines[0]] + lines[1:])
endfunction

command! Llm call Llm()
noremap <F2> :Llm<CR>
