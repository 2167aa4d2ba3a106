"""Schema-prompt formatting (F11) and prompt-token bookkeeping.

Re-expresses the reference's GLiNER2 schema prompt construction
(ref Tokenization/GLiNERTokenizer.swift:286-326; special tokens
ref Tokenization/GLiNER2PromptConfiguration.swift:13-29):

    ( [P] entities ( [E] label1 [E] label2 ... ) ) [SEP_TEXT] word1 word2 ...

Classification tasks prefix labels with "[C]" (ref GLiNERModel.swift:218).
Text words are lowercased in the encoded prompt
(ref GLiNERTokenizer.swift:306) — surface forms still come from the raw
text via char offsets.

In this engine the prompt string is what a subword-tokenizer backend
would consume; the deterministic backends key on labels directly, but the
formatter is part of the public parity surface (schema -> prompt is the
"query compilation" step) and is pinned by goldens.
"""

TOKEN_PROMPT = "[P]"
TOKEN_ENTITY = "[E]"
TOKEN_CLASSIFICATION = "[C]"
TOKEN_LIST = "[L]"
TOKEN_SEP_TEXT = "[SEP_TEXT]"


def format_entity_prompt(labels: list[str]) -> list[str]:
    """Prompt token sequence for an entity task."""
    out = ["(", TOKEN_PROMPT, "entities", "("]
    for lb in labels:
        out.extend([TOKEN_ENTITY, lb])
    out.extend([")", ")"])
    return out


def format_classification_prompt(task: str, labels: list[str]) -> list[str]:
    out = ["(", TOKEN_PROMPT, task, "("]
    for lb in labels:
        out.extend([TOKEN_CLASSIFICATION, lb])
    out.extend([")", ")"])
    return out


def schema_input_tokens(prompt_tokens: list[str], text_words: list[str]) -> list[str]:
    """Full encoder input token sequence: prompt + separator + lowercased
    text words (ref GLiNERTokenizer.swift:306,317-326)."""
    return prompt_tokens + [TOKEN_SEP_TEXT] + [w.lower() for w in text_words]


def prompt_token_count(labels: list[str]) -> int:
    """Tokens the schema consumes; must fit max_schema_tokens=64
    (ref GLiNERManifest max_schema_tokens)."""
    return len(format_entity_prompt(labels)) + 1  # + [SEP_TEXT]
