"""Dataset builders and collators (reference behavior: llm_quest/dataset.py).

Each dataset builder returns a list (or generator) of samples; ``collate_*``
functions turn sample lists into padded numpy batches; ``data_loader`` does
shuffling/batching. Static-shape note: for TPU efficiency prefer
``pad_to_multiple`` so XLA sees few distinct shapes instead of one per batch.
"""

import gzip
import json

import numpy as np

PAD_TOKEN_ID = 50256  # GPT-2 "<|endoftext|>"
NO_LOSS_ID = -100


def gpt_windows(text, tokenizer, max_length, stride):
    """Sliding-window next-token pairs over a tokenized corpus
    (reference: dataset.py:13-53).

    Returns (inputs, targets) int32 arrays of shape (n, max_length).
    """
    ids = tokenizer.encode(text)
    inputs, targets = [], []
    for i in range(0, len(ids) - max_length, stride):
        inputs.append(ids[i : i + max_length])
        targets.append(ids[i + 1 : i + max_length + 1])
    return np.asarray(inputs, dtype=np.int32), np.asarray(targets, dtype=np.int32)


def gpt_stream_windows(stream, tokenizer, max_length, stride, text_key="text"):
    """Streaming variant over an iterable of {"text": ...} samples
    (reference: dataset.py:56-95). Yields (input, target) per window."""
    for sample in stream:
        if text_key not in sample:
            raise KeyError(f'Missing "{text_key}" key in sample.')
        text = sample[text_key]
        if not isinstance(text, str):
            continue
        ids = tokenizer.encode(text)
        for i in range(0, len(ids) - max_length, stride):
            yield (
                np.asarray(ids[i : i + max_length], dtype=np.int32),
                np.asarray(ids[i + 1 : i + max_length + 1], dtype=np.int32),
            )


def load_jsonl_gz(path, max_samples=None, text_key="text"):
    """Gzip JSONL corpus (FineWeb sample) (reference: dataset.py:211-250)."""
    out = []
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if max_samples is not None and i >= max_samples:
                break
            out.append(json.loads(line)[text_key])
    return out


def load_instruction_data(path):
    """JSON or JSONL instruction data (reference: dataset.py:155-208)."""
    with open(path, encoding="utf-8") as f:
        first = f.read(1)
        f.seek(0)
        if first == "[":
            return json.load(f)
        return [json.loads(line) for line in f if line.strip()]


def instruction_dataset(data, tokenizer, format_fn):
    """Tokenized formatted instruction samples → list[list[int]]
    (reference: dataset.py:155-208)."""
    return [tokenizer.encode(format_fn(entry)) for entry in data]


def collate_function(batch, custom_max_len=None, pad_token_id=PAD_TOKEN_ID):
    """Pad-to-batch-max collator with 1-shifted targets
    (reference: dataset.py:853-896): targets get one trailing pad token then
    -100 no-loss ids; attention mask True on real tokens.

    batch: list[list[int]] token sequences.
    Returns dict {"input_ids", "targets", "attn_mask"} numpy arrays.
    """
    if custom_max_len:
        batch = [sample[:custom_max_len] for sample in batch]
    batch_max_len = max(len(s) for s in batch)

    inputs = np.full((len(batch), batch_max_len), pad_token_id, dtype=np.int32)
    targets = np.full((len(batch), batch_max_len), NO_LOSS_ID, dtype=np.int32)
    mask = np.zeros((len(batch), batch_max_len), dtype=bool)
    for i, s in enumerate(batch):
        n = len(s)
        inputs[i, :n] = s
        targets[i, : n - 1] = s[1:]
        targets[i, n - 1] = pad_token_id  # single pad target after sequence end
        mask[i, :n] = True
    return {"input_ids": inputs, "targets": targets, "attn_mask": mask}


def dpo_collate(batch, pad_token_id=PAD_TOKEN_ID, allowed_max_length=None, mask_prompt_tokens=True):
    """DPO collator (reference: dataset.py:899-978): chosen/rejected padded to
    a common length (+1 for label shifting), loss masks False on padding and
    (optionally) prompt tokens.

    batch: list of {"prompt": ids, "chosen": ids, "rejected": ids}.
    """
    max_common = max(max(len(x["chosen"]), len(x["rejected"])) for x in batch) + 1
    if allowed_max_length is not None:
        max_common = min(max_common, allowed_max_length)

    bsz = len(batch)
    chosen = np.full((bsz, max_common), pad_token_id, dtype=np.int32)
    rejected = np.full((bsz, max_common), pad_token_id, dtype=np.int32)
    chosen_mask = np.ones((bsz, max_common), dtype=bool)
    rejected_mask = np.ones((bsz, max_common), dtype=bool)

    for i, item in enumerate(batch):
        prompt_len = len(item["prompt"])
        chos = item["chosen"][:max_common]
        rej = item["rejected"][:max_common]
        chosen[i, : len(chos)] = chos
        rejected[i, : len(rej)] = rej
        chosen_mask[i, len(chos) :] = False
        rejected_mask[i, len(rej) :] = False
        if mask_prompt_tokens:
            chosen_mask[i, :prompt_len] = False
            rejected_mask[i, :prompt_len] = False

    return {
        "chosen": chosen,
        "rejected": rejected,
        "chosen_mask": chosen_mask,
        "rejected_mask": rejected_mask,
    }


def pref_reward_collate(batch, pad_token_id=PAD_TOKEN_ID, allowed_max_length=None):
    """Reward-model collator (reference: dataset.py:982-1070): like dpo_collate
    plus attention masks and the EoS token appended to each response; loss
    masks cover response tokens (+EoS), attention masks cover real tokens."""
    max_common = max(max(len(x["chosen"]), len(x["rejected"])) for x in batch) + 1  # +1 EoS
    if allowed_max_length is not None:
        max_common = min(max_common, allowed_max_length)

    bsz = len(batch)
    out = {}
    for key in ("chosen", "rejected"):
        toks = np.full((bsz, max_common), pad_token_id, dtype=np.int32)
        loss_mask = np.zeros((bsz, max_common), dtype=bool)
        attn_mask = np.zeros((bsz, max_common), dtype=bool)
        for i, item in enumerate(batch):
            prompt_len = len(item["prompt"])
            seq = list(item[key])[: max_common - 1] + [pad_token_id]  # append EoS
            n = len(seq)
            toks[i, :n] = seq
            attn_mask[i, :n] = True
            loss_mask[i, min(prompt_len, n) : n] = True  # response + EoS
        out[key] = toks
        out[f"{key}_mask"] = loss_mask
        out[f"{key}_attn_mask"] = attn_mask
    return out


def collate_function_mtp(batch, mtp_depth, custom_max_len=None, pad_token_id=PAD_TOKEN_ID):
    """MTP collator (reference: llama3_to_deepseekv3/custom_collate_mtp.py:5-176):
    the base (inputs, targets) pair plus ``mtp_depth`` pre-shifted pairs where
    shift-k inputs drop the first k tokens (pad fill) and shift-k targets
    shift likewise with -100 fill.

    Returns dict {"input_ids", "targets", "shifted_inputs": [k], "shifted_targets": [k]}.
    """
    base = collate_function(batch, custom_max_len, pad_token_id)
    inputs, targets = base["input_ids"], base["targets"]
    s = inputs.shape[1]

    shifted_inputs, shifted_targets = [], []
    for k in range(1, mtp_depth + 1):
        s_x = np.full_like(inputs, pad_token_id)
        s_y = np.full_like(targets, NO_LOSS_ID)
        s_x[:, : s - k] = inputs[:, k:]
        s_y[:, : s - k] = targets[:, k:]
        shifted_inputs.append(s_x)
        shifted_targets.append(s_y)

    return {
        "input_ids": inputs,
        "targets": targets,
        "attn_mask": base["attn_mask"],
        "shifted_inputs": shifted_inputs,
        "shifted_targets": shifted_targets,
    }


def pad_to_multiple(batch_dict, multiple=128, pad_token_id=PAD_TOKEN_ID):
    """Pad the sequence dim of a collated batch up to a multiple — keeps the
    number of distinct XLA-compiled shapes tiny (TPU-specific addition)."""
    s = batch_dict["input_ids"].shape[1]
    target = ((s + multiple - 1) // multiple) * multiple
    if target == s:
        return batch_dict
    pad = target - s
    out = dict(batch_dict)
    out["input_ids"] = np.pad(batch_dict["input_ids"], ((0, 0), (0, pad)), constant_values=pad_token_id)
    out["targets"] = np.pad(batch_dict["targets"], ((0, 0), (0, pad)), constant_values=NO_LOSS_ID)
    out["attn_mask"] = np.pad(batch_dict["attn_mask"], ((0, 0), (0, pad)), constant_values=False)
    return out


def data_loader(samples, batch_size, *, shuffle=False, drop_last=True, collate_fn=None, seed=0):
    """Minimal batching loader (reference: dataset.py:1073-1118).

    samples: list (or tuple of parallel arrays). Returns a list of batches;
    when collate_fn is None and samples is a tuple of arrays, batches are
    {"input_ids", "targets"} dicts.
    """
    if isinstance(samples, tuple):
        n = len(samples[0])
        idx = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        batches = []
        end = n - (n % batch_size) if drop_last else n
        for i in range(0, end, batch_size):
            sel = idx[i : i + batch_size]
            if len(sel) < batch_size and drop_last:
                break
            batches.append({"input_ids": samples[0][sel], "targets": samples[1][sel]})
        return batches

    idx = np.arange(len(samples))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    batches = []
    end = len(samples) - (len(samples) % batch_size) if drop_last else len(samples)
    for i in range(0, end, batch_size):
        sel = idx[i : i + batch_size]
        if len(sel) < batch_size and drop_last:
            break
        chunk = [samples[j] for j in sel]
        batches.append(collate_fn(chunk) if collate_fn else chunk)
    return batches


def spam_dataset(rows, tokenizer, max_length=None, pad_token=PAD_TOKEN_ID):
    """CSV-style spam classification data (reference: dataset.py:98-152).

    rows: iterable of (text, label) pairs (load the CSV host-side).
    Returns dict {"input_ids", "targets", "attn_mask", "max_length"} —
    max_length is reused for consistent val/test padding.
    """
    texts, labels = zip(*rows)
    ids = [tokenizer.encode(t) for t in texts]
    if max_length:
        ids = [v[:max_length] for v in ids]
    else:
        max_length = max(len(v) for v in ids)

    inputs = np.full((len(ids), max_length), pad_token, dtype=np.int32)
    mask = np.zeros((len(ids), max_length), dtype=bool)
    for i, v in enumerate(ids):
        inputs[i, : len(v)] = v[:max_length]
        mask[i, : min(len(v), max_length)] = True
    return {
        "input_ids": inputs,
        "targets": np.asarray(labels, dtype=np.int32),
        "attn_mask": mask,
        "max_length": max_length,
    }


def load_csv_rows(path, text_col="text", label_col="label"):
    """Minimal CSV reader for (text, label) rows — no pandas dependency."""
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        return [(row[text_col], int(row[label_col])) for row in reader]


def reasoning_dataset(path, tokenizer):
    """GSM8K JSONL → DeepSeek <think>/<answer> format samples
    (reference: dataset.py:450-512). Returns list of dicts with tokenized
    "prompt", "full_response" and the gold "answer" STRING."""
    from llm_quest_tpu.utils import ResponseExtractor, alpaca_deepseek_format

    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            entry = json.loads(line)
            formatted = alpaca_deepseek_format(entry, include_response=True)
            prompt, sep, response = formatted.partition("### Response:")
            prompt = prompt + sep
            full_response = response.strip()
            answer = ResponseExtractor.get_answer(full_response)
            out.append(
                {
                    "prompt": tokenizer.encode(prompt),
                    "full_response": tokenizer.encode(full_response),
                    "answer": answer,
                }
            )
    return out


def preference_dataset(path, tokenizer, prompts_only=False):
    """Alpaca-format preference triplets (reference: dataset.py:386-447).
    chosen/rejected include the formatted prompt; prompts_only for RLHF."""
    from llm_quest_tpu.utils import alpaca_prompt_format

    with open(path, encoding="utf-8") as f:
        entries = json.load(f)

    out = []
    for entry in entries:
        formatted = alpaca_prompt_format(entry, include_output=False)
        prompt_ids = tokenizer.encode(formatted)
        if prompts_only:
            out.append(prompt_ids)
        else:
            out.append(
                {
                    "prompt": prompt_ids,
                    "chosen": tokenizer.encode(f"{formatted}{entry['chosen']}"),
                    "rejected": tokenizer.encode(f"{formatted}{entry['rejected']}"),
                }
            )
    return out


RPT_DEFAULT_INSTRUCTION = (
    "### Instruction:\n"
    "Complete the given text under '### Context' by predicting the next token. "
    "Please reason step by step and list multiple candidates first. "
    "Select the most probable one as your final prediction by wrapping it in <answer> </answer> tags. "
    "(note: the token may begin with a space, e.g., '<answer> para</answer>' or '<answer> =</answer>'.\n\n"
    "### Context\n"
)


def rpt_structured_dataset(
    entries,
    tokenizer,
    max_context_length,
    *,
    labels_length=25,
    instruction=None,
    valid_indices=None,
    apply_chat_template=False,
    truncate_sample=None,
    min_context_tokens=None,
):
    """RPT (context, labels-string) pairs at every valid token position
    (reference: dataset.py:522-732). entries: list of {"question","answer"}
    GSM8K dicts. Returns a lazy index-based dataset as (samples, allowed,
    getter) — call getter(i) → {"prompt": ids, "labels": str}.

    apply_chat_template=True follows the reference's Qwen3 RPT variant
    (dataset.py:646-658, 705-720 / rpt_training_qwen3.py): the context budget
    is computed from the TEMPLATED instruction length, and each sample applies
    the chat template to the COMBINED instruction+context string (context
    stays inside the user turn, before the generation prompt)."""
    instruction = instruction if instruction is not None else RPT_DEFAULT_INSTRUCTION
    if apply_chat_template:
        # templated-instruction length budgets the context window
        # (reference dataset.py:648-658)
        out = tokenizer.apply_chat_template(
            [{"role": "user", "content": instruction}],
            tokenize=True, add_generation_prompt=True, enable_thinking=True,
        )
        templated_len = len(out["input_ids"] if hasattr(out, "keys") and "input_ids" in out else out)
        instr_ids = None
        available = max_context_length - templated_len
    else:
        instr_ids = tokenizer.encode(instruction)
        available = max_context_length - len(instr_ids)

    samples = []
    for data in entries:
        solution, _, answer = data["answer"].rpartition("\n#### ")
        full = data["question"] + "\n\n" + f"{solution} So the answer is <answer>{answer}</answer>"
        if truncate_sample is not None:
            start, end = truncate_sample
            full = full[max(0, start) : min(len(full), end)]
        samples.append(tokenizer.encode(full))

    if valid_indices is not None:
        allowed = [(s, t) for s, t in valid_indices if t < len(samples[s]) - labels_length]
    else:
        allowed = []
        for s_idx, toks in enumerate(samples):
            last_valid = len(toks) - labels_length
            if last_valid < 1:
                continue
            for t_idx in range(last_valid):
                start_ctx = max(0, t_idx + 1 - max_context_length)
                if min_context_tokens is not None and (t_idx + 1 - start_ctx) < min_context_tokens:
                    continue
                allowed.append((s_idx, t_idx))

    def getter(index):
        s_idx, t_idx = allowed[index]
        end_ctx = t_idx + 1
        start_ctx = max(0, end_ctx - available)
        context_ids = samples[s_idx][start_ctx:end_ctx]
        labels_ids = samples[s_idx][end_ctx : end_ctx + labels_length]
        if apply_chat_template:
            # template over instruction+context combined, so the context sits
            # inside the user turn (reference dataset.py:705-720)
            full_prompt = tokenizer.apply_chat_template(
                [{"role": "user", "content": instruction + tokenizer.decode(context_ids)}],
                tokenize=False, add_generation_prompt=True, enable_thinking=True,
            )
            prompt_ids = tokenizer.encode(full_prompt)
        else:
            prompt_ids = instr_ids + context_ids
        return {"prompt": prompt_ids, "labels": tokenizer.decode(labels_ids)}

    return samples, allowed, getter


def rpt_continuous_dataset(text, tokenizer, max_context_length, *, labels_length=25, instruction=None,
                           min_context_tokens=None):
    """RPT over a continuous corpus (reference: dataset.py:741-823) — same
    pair construction over one long token stream."""
    entries_like = [{"question": "", "answer": "\n#### "}]  # unused shell
    instruction = instruction if instruction is not None else RPT_DEFAULT_INSTRUCTION
    instr_ids = tokenizer.encode(instruction)
    available = max_context_length - len(instr_ids)
    toks = tokenizer.encode(text)

    allowed = []
    for t_idx in range(len(toks) - labels_length):
        start_ctx = max(0, t_idx + 1 - max_context_length)
        if min_context_tokens is not None and (t_idx + 1 - start_ctx) < min_context_tokens:
            continue
        allowed.append(t_idx)

    def getter(index):
        t_idx = allowed[index]
        end_ctx = t_idx + 1
        start_ctx = max(0, end_ctx - available)
        return {
            "prompt": instr_ids + toks[start_ctx:end_ctx],
            "labels": tokenizer.decode(toks[end_ctx : end_ctx + labels_length]),
        }

    return toks, allowed, getter


CIFAR10_MEAN = np.asarray([0.4914, 0.4822, 0.4465], np.float32)
CIFAR10_STD = np.asarray([0.2470, 0.2435, 0.2616], np.float32)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_images(images, mean=CIFAR10_MEAN, std=CIFAR10_STD):
    """uint8 (n, h, w, c) or float (n, c, h, w) images → normalized
    (n, c, h, w) float32 (reference: dataset.py:253-292 ToTensor+Normalize)."""
    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    if images.ndim == 4 and images.shape[-1] in (1, 3):  # NHWC → NCHW
        images = images.transpose(0, 3, 1, 2)
    return (images - mean[None, :, None, None]) / std[None, :, None, None]


def multimodal_batches(images, captions, tokenizer, batch_size, *, max_caption_len=None,
                       pad_token_id=PAD_TOKEN_ID, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Image-caption pairs → batches of {"image", "input_ids",
    "attention_mask"} (reference: dataset.py:295-383). Resizing is the
    caller's concern (host-side)."""
    images = normalize_images(images, mean, std)
    ids = [tokenizer.encode(c) for c in captions]
    max_len = max_caption_len or max(len(v) for v in ids)

    batches = []
    for i in range(0, len(ids) - len(ids) % batch_size, batch_size):
        chunk = ids[i : i + batch_size]
        inp = np.full((batch_size, max_len), pad_token_id, dtype=np.int32)
        mask = np.zeros((batch_size, max_len), dtype=bool)
        for j, v in enumerate(chunk):
            v = v[:max_len]
            inp[j, : len(v)] = v
            mask[j, : len(v)] = True
        batches.append({"image": images[i : i + batch_size], "input_ids": inp, "attention_mask": mask})
    return batches
