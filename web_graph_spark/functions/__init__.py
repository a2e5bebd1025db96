"""Training-data pipeline functions (first-class engine components):

text        language-ID heuristic, quality scoring, token counting,
            document fingerprinting — all JVM built-ins (codegen)
dedup       exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
            cosine near-dup
similarity  brute-force cosine top-k + LSH-bucketed ANN
media       multimodal binary columns: schema + Arrow plumbing (decode
            stubbed — image/audio libs not in this image)
"""
