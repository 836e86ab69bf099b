#!/usr/bin/env python3
"""Generate the checked-in legacy-model fixture (reference final.beta /
final.gamma format) used by the pipe_*_fixedmodel gates.

Deterministic, no inputs: doc mixes and topic-word weights come from small
modular formulas, so regenerating always produces byte-identical files.
The doc list covers a SUBSET of each pipeline fabrication's document keys
(the rest exercise the uniform-default path) and the word list a subset of
each pipeline's featurized vocabulary at sf0.01 (misses likewise default).
One doc ('10.1.24.9') carries an all-zero gamma line — the reference's
"empty doc" case, which parses to a zero vector (score contribution 0).

Run from the repo root: python3 tools/make_model_fixture.py
"""
import math
import os

K = 3

DOCS = (
    [f"10.0.{i}.1" for i in range(10)] +          # flow sip side
    [f"10.0.{i}.2" for i in range(10)] +          # flow dip side
    [f"10.1.{i}.9" for i in range(25)] +          # dns ip_dst
    [f"10.2.{i}.7" for i in range(25)] +          # proxy clientip
    [str(i) for i in range(25)]                   # events user_id
)

WORDS = sorted(
    # flow (port_timeBin_ibytBin_ipktBin, double-rendered, optional -1_ prefix)
    ["111111.0_-1.0_2.0_1.0", "111111.0_1.0_2.0_1.0", "111111.0_0.0_2.0_1.0",
     "333333.0_-1.0_2.0_1.0", "333333.0_2.0_2.0_1.0", "111111.0_0.0_2.0_-1.0",
     "-1_746.0_2.0_2.0_1.0", "-1_937.0_2.0_2.0_1.0"] +
    # dns (8-component)
    ["0_1_1_0_0_-1_2_2", "0_3_1_2_-1_2_0_1", "0_-1_1_0_0_0_3_1",
     "0_2_-1_2_-1_2_0_2", "0_-1_1_0_0_-1_2_0", "0_-1_2_0_0_0_3_2"] +
    # proxy (7-component)
    ["0_2_GET_-1_text_0_3", "0_-1_GET_-1_text_0_4", "0_-1_POST_-1_image_0_4",
     "0_-1_POST_-1_image_0_3", "0_-1_POST_-1_image_0_2", "0_1_GET_-1_text_0_2"] +
    # events (type_hourBin_valueBin)
    ["signup_3_0", "click_2_0", "error_0_0", "view_2_0", "purchase_3_0",
     "error_1_0"])

ZERO_DOC = "10.1.24.9"

out = os.path.join(os.path.dirname(__file__), os.pardir,
                   "src", "main", "resources", "graft", "fixtures",
                   "legacy_model")
os.makedirs(out, exist_ok=True)

with open(os.path.join(out, "docs.txt"), "w") as f:
    f.write("\n".join(DOCS) + "\n")
with open(os.path.join(out, "words.txt"), "w") as f:
    f.write("\n".join(WORDS) + "\n")

# final.gamma: one line per doc (docs.txt order), unnormalized topic weights
with open(os.path.join(out, "final.gamma"), "w") as f:
    for i, d in enumerate(DOCS):
        if d == ZERO_DOC:
            w = [0.0] * K
        else:
            w = [float((i * 7 + 3 * t) % 11 + 1) for t in range(K)]
        f.write(" ".join(repr(x) for x in w) + "\n")

# final.beta: one line per topic, log P(word|topic) per vocab column in
# words.txt order, plus the trailing sentinel column (log ~ -inf -> -745)
with open(os.path.join(out, "final.beta"), "w") as f:
    for t in range(K):
        logs = [repr(math.log((j * 5 + 7 * t) % 13 + 1))
                for j in range(len(WORDS))]
        f.write(" ".join(logs + ["-745.0"]) + "\n")

print(f"wrote fixture to {os.path.normpath(out)}: "
      f"{len(DOCS)} docs, {len(WORDS)} words, k={K}")
