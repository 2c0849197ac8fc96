"""llama-cli equivalent: prompt → streamed completion.

Mirrors the flag surface of the reference's ``tools/main`` for the core
options (``-m -p -n -c --temp --top-k --top-p --min-p --seed``; env mirrors
use the same ``LLAMA_ARG_*`` names as ``common/arg.cpp``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    from ..common.args import build_parser as registry_parser

    ap = registry_parser("cli", description="TPU-native GGUF text generation")
    ap.prog = "llama-cli (TPU)"
    # tool-specific extras on top of the shared registry (common/arg.cpp
    # scoping analog)
    ap.add_argument(
        "--prompt-cache", default=None,
        help="session file: reuse cached prefix state and save on exit "
        "(llama-cli --prompt-cache analog)",
    )
    ap.add_argument("--no-display-prompt", action="store_true")
    ap.add_argument("--perf", action="store_true", help="print perf counters as JSON")
    ap.set_defaults(prompt="")
    return ap


def parse_logit_bias(entries: list[str]) -> dict[int, float]:
    """``TOKEN_ID(+|-)BIAS`` entries (arg.cpp -l parsing): ``15043+1``,
    ``15043-1``, ``16024-inf``."""
    out: dict[int, float] = {}
    for e in entries:
        for sep in ("+", "-"):
            head, s, tail = e.partition(sep)
            if s and head.strip().lstrip("-").isdigit() and tail:
                v = float("inf") if tail.strip() == "inf" else float(tail)
                out[int(head)] = v if sep == "+" else -v
                break
        else:
            raise SystemExit(f"--logit-bias: cannot parse {e!r}")
    return out


def parse_kv_overrides(entries: list[str]) -> dict:
    """``KEY=TYPE:VALUE`` overrides (llama_model_kv_override analog,
    llama.h:242-253); TYPE in int/float/bool/str."""
    out = {}
    for e in entries:
        key, eq, spec = e.partition("=")
        typ, colon, val = spec.partition(":")
        if not eq or not colon:
            raise SystemExit(f"--override-kv: want KEY=TYPE:VALUE, got {e!r}")
        cast = {"int": int, "float": float, "str": str,
                "bool": lambda s: s.lower() in ("1", "true", "yes")}.get(typ)
        if cast is None:
            raise SystemExit(f"--override-kv: unknown type {typ!r}")
        out[key] = cast(val)
    return out


def _generate_with_cache(eng, prompt: str, args, chain, stream, abort=None):
    """Session-file generation: reuse the cached KV prefix when the new
    prompt extends the cached token history (tools/main session load,
    main.cpp:236-254 + prompt-prefix matching :336-348)."""
    import os as _os

    import numpy as np

    ids = eng.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
    cached: list[int] = []
    if _os.path.exists(args.prompt_cache):
        try:
            cached = eng.load_state(args.prompt_cache)
        except ValueError:
            cached = []
    n_match = 0
    while n_match < len(cached) and n_match < len(ids) - 1 and cached[n_match] == ids[n_match]:
        n_match += 1
    if n_match < len(cached):  # diverged: rewind to the shared prefix
        eng.set_n_past(n_match) if n_match else eng.reset()
    tail = ids[n_match:]
    logits = eng.prefill(tail) if n_match == 0 else eng.decode_chunk(tail)[-1]
    all_ids = list(ids)
    ro = getattr(args, "prompt_cache_ro", False)
    if not ro:
        # prompt-eval state saved immediately (main.cpp need_to_save_session)
        eng.save_state(args.prompt_cache, all_ids)
    eog = eng.tokenizer.vocab.special.eog_ids()
    for _ in range(args.n_predict):
        if abort is not None and abort():
            break
        tok_id = chain.sample(logits, all_ids)
        chain.accept(tok_id, is_eog=tok_id in eog)
        if tok_id in eog:
            break
        all_ids.append(tok_id)
        stream(tok_id)
        logits = eng.decode_one(tok_id)
    if not ro and getattr(args, "prompt_cache_all", False):
        # --prompt-cache-all: generated tokens join the session file
        eng.save_state(args.prompt_cache, all_ids)


def _generate_self_extend(eng, prompt: str, args, chain, stream, state):
    """Grouped-attention self-extend generation (tools/main ga_n/ga_w loop,
    main.cpp:548-561): whenever the logical position passes ``ga_i + ga_w``
    the cache positions are block-compressed by ``ga_n`` via
    seq_add/seq_div/seq_add, letting the context run past n_ctx_train."""
    import numpy as np

    ga_n, ga_w = args.grp_attn_n, args.grp_attn_w
    ids = eng.tokenizer.tokenize(prompt, add_special=True, parse_special=True)
    logits = eng.prefill(ids)
    n_p = len(ids)  # logical position of the next token
    ga_i = 0
    eog = eng.tokenizer.vocab.special.eog_ids()
    all_ids = list(ids)
    for _ in range(args.n_predict):
        if state["stopped"]:
            break
        while n_p >= ga_i + ga_w:
            ib = (ga_n * ga_i) // ga_w
            bd = (ga_w // ga_n) * (ga_n - 1)
            dd = (ga_w // ga_n) - ib * bd - ga_w
            eng.seq_add(ga_i, n_p, ib * bd)
            eng.seq_div(ga_i + ib * bd, n_p + ib * bd, ga_n)
            eng.seq_add(ga_i + ib * bd + ga_w, n_p + ib * bd, dd)
            n_p -= bd
            ga_i += ga_w // ga_n
        tok_id = chain.sample(logits, all_ids)
        chain.accept(tok_id, is_eog=tok_id in eog)
        if tok_id in eog:
            break
        all_ids.append(tok_id)
        stream(tok_id)
        logits = eng.decode_one(tok_id)
        n_p += 1


def _read_user_input(multiline: bool) -> str | None:
    """console.cpp readline analog: Enter submits; a line ending in ``\\``
    toggles multiline mode (where Enter inserts a newline and a trailing
    ``\\`` submits).  Returns None on EOF with no pending input."""
    lines: list[str] = []
    ml = multiline
    while True:
        try:
            line = input()
        except EOFError:
            return "\n".join(lines) if lines else None
        if line.endswith("\\"):
            lines.append(line[:-1])
            ml = not ml
            if not ml:
                return "\n".join(lines)
        else:
            lines.append(line)
            if not ml:
                return "\n".join(lines)


def _dump_tokens(tok, ids):
    """--verbose-prompt: id -> piece table on stderr (main.cpp analog)."""
    for t in ids:
        piece = tok.detokenize([t], special=True)
        sys.stderr.write(f"{t:>8} -> {piece!r}\n")


def _interactive_main(eng, args, chain, prompt, stops, conv: bool) -> int:
    """The tools/main interactive / conversation REPL: generate until EOG /
    a reverse prompt / the -n limit, then return control to the user; feed
    their input (with --in-prefix/--in-suffix, or through the chat template
    in conversation mode) and continue (main.cpp interactive loop)."""
    tok = eng.tokenizer
    eog = set(tok.vocab.special.eog_ids())
    use_color = args.color
    C_PROMPT = "\033[2m" if use_color else ""
    C_GEN = "\033[32m" if use_color else ""
    C_USER = "\033[1m" if use_color else ""
    C_RST = "\033[0m" if use_color else ""

    tpl = None
    if conv:
        tpl = args.chat_template or tok.vocab.chat_template
        if args.chat_template_file:
            with open(args.chat_template_file, encoding="utf-8") as f:
                tpl = f.read()

    from ..chat import render_chat_template

    def render(msgs, gen):
        return render_chat_template(tpl, msgs, add_generation_prompt=gen)

    chat: list[dict] = []
    all_ids: list[int] = []
    n_keep = getattr(args, "n_keep", 0) or 0

    # ---- initial context ---------------------------------------------------
    if conv:
        # -p / -sys is the system prompt in conversation mode (arg.cpp:
        # conversation + prompt => system message)
        sysmsg = args.system_prompt or prompt
        if sysmsg:
            chat.append({"role": "system", "content": sysmsg})
        init_text = ""
        if chat:
            try:
                init_text = render(chat, False)
            except Exception:
                init_text = ""  # template rejects lone system turns: defer
        wait_first = True
    else:
        init_text = prompt
        wait_first = args.interactive_first or not prompt

    logits = None
    if init_text:
        ids = tok.tokenize(init_text, add_special=True, parse_special=True)
        if args.verbose_prompt:
            _dump_tokens(tok, ids)
        if not args.no_display_prompt and not conv:
            sys.stdout.write(C_PROMPT + init_text + C_RST)
            sys.stdout.flush()
        logits = eng.prefill(ids)
        all_ids.extend(ids)

    hold = max((len(s) for s in stops), default=0)
    max_ctx = eng.max_seq

    def ensure_room(n_next: int) -> bool:
        """Context-shift when the next chunk wouldn't fit (main.cpp
        context swap: keep n_keep, discard half the rest)."""
        if eng.n_past + n_next < max_ctx:
            return True
        n_discard = max((eng.n_past - n_keep) // 2, n_next)
        try:
            eng.context_shift(n_keep, n_discard)
        except Exception as e:
            sys.stderr.write(f"\ncontext full and shift unavailable: {e}\n")
            return False
        del all_ids[n_keep:n_keep + n_discard]
        return True

    def gen_turn(logits):
        """One generation stretch; returns (reason, logits, text)."""
        buf = ""
        text: list[str] = []
        n_remain = args.n_predict
        sys.stdout.write(C_GEN)
        try:
            while n_remain != 0:
                if not ensure_room(1):
                    return "ctx_full", logits, "".join(text)
                tid = chain.sample(logits, all_ids)
                chain.accept(tid, is_eog=tid in eog)
                all_ids.append(tid)
                logits = eng.decode_one(tid)
                if tid in eog:
                    return "eog", logits, "".join(text)
                piece = tok.detokenize([tid], special=not conv)
                text.append(piece)
                buf += piece
                stop_i = -1
                for s in stops:
                    i = buf.find(s)
                    if i >= 0:
                        stop_i = i + len(s)
                        break
                if stop_i >= 0:
                    sys.stdout.write(buf[:stop_i])
                    sys.stdout.flush()
                    return "stop", logits, "".join(text)
                if len(buf) > hold:
                    cut = len(buf) - hold
                    sys.stdout.write(buf[:cut])
                    buf = buf[cut:]
                    sys.stdout.flush()
                n_remain -= 1
            sys.stdout.write(buf)
            return "limit", logits, "".join(text)
        except KeyboardInterrupt:
            sys.stdout.write(buf)
            return "interrupt", logits, "".join(text)
        finally:
            sys.stdout.write(C_RST)
            sys.stdout.flush()

    first = True
    while True:
        if logits is not None and not (first and wait_first):
            reason, logits, text = gen_turn(logits)
            if conv:
                chat.append({"role": "assistant", "content": text})
            if reason == "ctx_full":
                return 1
            if conv and args.single_turn:
                break
        first = False
        if use_color:
            sys.stdout.write(C_USER)
            sys.stdout.flush()
        if not conv and args.in_prefix:
            sys.stdout.write(args.in_prefix)
            sys.stdout.flush()
        try:
            line = _read_user_input(args.multiline_input)
        except KeyboardInterrupt:
            line = None
        if use_color:
            sys.stdout.write(C_RST)
            sys.stdout.flush()
        if line is None:
            break  # EOF: leave the REPL
        if conv:
            try:
                past = render(chat, False) if chat else ""
            except Exception:
                past = ""
            chat.append({"role": "user", "content": line})
            new = render(chat, True)
            delta = new[len(past):] if past and new.startswith(past) else new
            ids = tok.tokenize(delta, add_special=not all_ids,
                               parse_special=True)
        else:
            if args.in_suffix:
                sys.stdout.write(args.in_suffix)
                sys.stdout.flush()
            text_in = args.in_prefix + line + args.in_suffix
            ids = tok.tokenize(text_in, add_special=False, parse_special=True)
            if args.in_prefix_bos and tok.vocab.special.bos is not None:
                ids = [tok.vocab.special.bos] + ids
        if args.verbose_prompt:
            _dump_tokens(tok, ids)
        if not ids:
            continue
        if not ensure_room(len(ids)):
            return 1
        all_ids.extend(ids)
        logits = eng.decode_chunk(ids)[-1]
    sys.stdout.write("\n")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..common.args import maybe_print_completion

    if maybe_print_completion(args, "cli", "llama-cli"):
        return 0

    if args.model_url or args.hf_repo or args.hf_file:
        raise SystemExit(
            "model downloads (--model-url/--hf-repo) are unavailable: this "
            "environment has no network egress; fetch the GGUF out of band "
            "and pass -m")

    # heavy imports after argparse so --help stays fast
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")
    if args.list_devices:
        import jax

        for d in jax.devices():
            print(d)
        return 0
    from ..runtime.engine import Engine
    from ..sampling.samplers import SamplerParams

    prompt = args.prompt
    if args.file:
        with open(args.file, encoding="utf-8") as f:
            prompt = f.read()
    if not args.no_escape:  # escape processing defaults ON (arg.cpp);
        # -e kept as a compat no-op, --no-escape turns it off
        prompt = prompt.encode().decode("unicode_escape").encode("latin-1").decode("utf-8", "replace")

    kv_dtype = None
    if args.cache_type_k == "q8":
        kv_dtype = "q8"
    elif args.cache_type_k == "f32":
        import jax.numpy as jnp

        kv_dtype = jnp.float32
    # rope/metadata overrides ride the loader (llama_model_kv_override +
    # cparams rope overrides)
    kv_overrides = parse_kv_overrides(args.override_kv)
    cfg_overrides: dict = {}
    if args.rope_freq_base:
        cfg_overrides["rope_base"] = args.rope_freq_base
    if args.rope_scale_factor:
        from ..gguf.constants import RopeScalingType

        cfg_overrides["rope_scaling"] = RopeScalingType.LINEAR
        cfg_overrides["rope_scale"] = args.rope_scale_factor
    if args.rope_freq_scale:
        from ..gguf.constants import RopeScalingType

        cfg_overrides["rope_scaling"] = RopeScalingType.LINEAR
        cfg_overrides["rope_scale"] = 1.0 / args.rope_freq_scale
    if args.rope_scaling:
        from ..gguf.constants import RopeScalingType

        cfg_overrides["rope_scaling"] = {
            "none": RopeScalingType.NONE, "linear": RopeScalingType.LINEAR,
            "yarn": RopeScalingType.YARN,
            "longrope": RopeScalingType.LONGROPE,
        }[args.rope_scaling]
    if args.yarn_orig_ctx:
        cfg_overrides["rope_orig_ctx"] = args.yarn_orig_ctx
    from ..common.args import mesh_from_args

    eng = Engine.from_gguf(args.model, max_seq=args.ctx_size,
                           kv_cache_dtype=kv_dtype,
                           repack_int8=getattr(args, "repack_int8", False),
                           swa_ring=args.swa_ring,
                           kv_overrides=kv_overrides or None,
                           cfg_overrides=cfg_overrides or None,
                           mesh=mesh_from_args(args))
    if args.check_tensors:
        from ..runtime.weights import check_params_finite

        check_params_finite(eng.params)
    for lora_path in args.lora:
        eng.apply_lora_file(lora_path, args.lora_scale)
    cv_lr = args.control_vector_layer_range or [0, None]
    for cv_path in args.control_vector:
        eng.apply_control_vector_file(cv_path, args.control_vector_scale,
                                      layer_start=cv_lr[0],
                                      layer_end=cv_lr[1])
    for cv_file, cv_scale in (args.control_vector_scaled or ()):
        eng.apply_control_vector_file(cv_file, float(cv_scale),
                                      layer_start=cv_lr[0],
                                      layer_end=cv_lr[1])

    logit_bias = parse_logit_bias(args.logit_bias)
    if args.ignore_eos:  # -inf bias on every EOG token (arg.cpp --ignore-eos)
        for t in eng.tokenizer.vocab.special.eog_ids():
            logit_bias[t] = float("-inf")
    dry_breakers: list[int] = []
    for brk in args.dry_sequence_breakers or ():
        dry_breakers.extend(
            eng.tokenizer.tokenize(brk, add_special=False, parse_special=False))
    sampler = SamplerParams(
        temp=args.temp,
        dynatemp_range=args.dynatemp_range,
        dynatemp_exponent=args.dynatemp_exponent,
        top_k=args.top_k,
        top_p=args.top_p,
        min_p=args.min_p,
        typical_p=args.typical,
        xtc_probability=args.xtc_probability,
        xtc_threshold=args.xtc_threshold,
        penalty_repeat=args.repeat_penalty,
        penalty_last_n=args.repeat_last_n,
        penalty_freq=args.frequency_penalty,
        penalty_present=args.presence_penalty,
        mirostat=args.mirostat,
        mirostat_tau=args.mirostat_tau,
        mirostat_eta=args.mirostat_eta,
        logit_bias=logit_bias,
        dry_multiplier=args.dry_multiplier,
        dry_base=args.dry_base,
        dry_allowed_length=args.dry_allowed_length,
        dry_penalty_last_n=args.dry_penalty_last_n,
        dry_sequence_breakers=tuple(dry_breakers),
        top_n_sigma=args.top_n_sigma,
        min_keep=args.min_keep,
        seed=args.seed if args.seed >= 0 else 0xFFFFFFFF,
        greedy=args.temp <= 0,
    )

    if args.system_prompt_file:
        with open(args.system_prompt_file, encoding="utf-8") as f:
            args.system_prompt = f.read()

    # conversation-mode resolution (arg.cpp COMMON_CONVERSATION_MODE_AUTO:
    # a chat template turns on chat mode; here AUTO additionally requires a
    # TTY so scripted `-p` completions stay plain)
    has_tpl = bool(args.chat_template or args.chat_template_file
                   or eng.tokenizer.vocab.chat_template)
    interactive_req = args.interactive or args.interactive_first
    conv = (not args.no_conversation) and (
        args.conversation or args.single_turn
        or (has_tpl and (interactive_req or sys.stdin.isatty())))
    interactive = interactive_req or conv

    if args.system_prompt and not interactive:
        # -sys renders {system, user} through the chat template
        # (tools/main -sys + common_chat_templates_apply)
        from ..chat import render_chat_template

        tpl = args.chat_template or eng.tokenizer.vocab.chat_template
        if args.chat_template_file:
            with open(args.chat_template_file, encoding="utf-8") as f:
                tpl = f.read()
        messages = [{"role": "system", "content": args.system_prompt}]
        if prompt:
            messages.append({"role": "user", "content": prompt})
        prompt = render_chat_template(tpl, messages, add_generation_prompt=True)

    if not args.no_display_prompt and not interactive:
        sys.stdout.write(prompt)
        sys.stdout.flush()
    if args.verbose_prompt and not interactive:
        _dump_tokens(eng.tokenizer, eng.tokenizer.tokenize(
            prompt, add_special=True, parse_special=True))

    tok = eng.tokenizer

    from ..sampling.samplers import SamplerChain

    chain = SamplerChain(sampler, eng.cfg.n_vocab)
    grammar_src = args.grammar
    if args.grammar_file:
        with open(args.grammar_file, encoding="utf-8") as f:
            grammar_src = f.read()
    schema_src = args.json_schema
    if args.json_schema_file:
        with open(args.json_schema_file, encoding="utf-8") as f:
            schema_src = f.read()
    if schema_src:
        from ..grammar import json_schema_to_gbnf

        grammar_src = json_schema_to_gbnf(json.loads(schema_src))
    if grammar_src:
        from ..grammar import Grammar, grammar_vocab_from_tokenizer

        chain.set_grammar(Grammar.from_string(grammar_src), grammar_vocab_from_tokenizer(tok))

    # -r stop strings (tools/main antiprompt): hold back up to the longest
    # stop string so a matched stop never prints
    stops: list[str] = list(args.reverse_prompt or [])
    hold = max((len(s) for s in stops), default=0)
    state = {"buf": "", "stopped": False}

    n_streamed = [0]

    def stream(token_id: int):
        if state["stopped"]:  # tokens raced in after the stop matched
            return
        n_streamed[0] += 1
        if args.print_token_count > 0 and \
                n_streamed[0] % args.print_token_count == 0:
            sys.stderr.write(f"\n[token count: {n_streamed[0]}]\n")
        state["buf"] += tok.detokenize([token_id], special=True)
        for s in stops:
            i = state["buf"].find(s)
            if i >= 0:
                sys.stdout.write(state["buf"][:i])
                state["buf"] = ""
                state["stopped"] = True
                break
        else:
            if len(state["buf"]) > hold:
                sys.stdout.write(state["buf"][:-hold] if hold else state["buf"])
                state["buf"] = state["buf"][-hold:] if hold else ""
        sys.stdout.flush()

    t0 = time.perf_counter()
    if interactive:
        rc = _interactive_main(eng, args, chain, prompt, stops, conv)
        if args.perf:
            perf = eng.perf.summary()
            perf["wall_s"] = round(time.perf_counter() - t0, 3)
            print(json.dumps(perf), file=sys.stderr)
        return rc
    if args.grp_attn_n > 1:
        _generate_self_extend(eng, prompt, args, chain, stream, state)
    elif args.prompt_cache:
        _generate_with_cache(eng, prompt, args, chain, stream,
                             abort=lambda: state["stopped"])
    else:
        eng.generate(prompt, n_predict=args.n_predict, sampler=chain,
                     stream_cb=stream,
                     abort_callback=lambda: state["stopped"])
    sys.stdout.write(state["buf"])
    sys.stdout.write("\n")
    if args.perf:
        perf = eng.perf.summary()
        perf["wall_s"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(perf), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
