"""Directory scaffold generator (parity: /root/reference/setup.py — not a
packaging script there either: it creates the data/vis/log tree plus
per-sequence single_N/{vert,hori,annot,visualization} dirs for 276 sequences).
"""

import os

NUM_SEQUENCES = 276


def main(num_sequences: int = NUM_SEQUENCES):
    for d in ["data", "data/HuPR", "visualization", "logs",
              "preprocessing", "preprocessing/raw_data",
              "preprocessing/raw_data/iwr1843"]:
        os.makedirs(d, exist_ok=True)
    for i in range(1, num_sequences + 1):
        base = f"data/HuPR/single_{i}"
        for sub in ["vert", "hori", "annot", "visualization"]:
            os.makedirs(os.path.join(base, sub), exist_ok=True)


if __name__ == "__main__":
    main()
