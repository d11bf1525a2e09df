#!/usr/bin/env python
"""Offline trainer for the hashed char-trigram language-ID scorer.

Builds a seeded synthetic corpus from PUBLIC per-language function-word
lists (the highest-frequency closed-class words of en/de/fr/es plus the
pinyin-tone convention this repo's fixtures use for zh), featurizes with
the SAME signed md5 hashing trick the engine runs
(operators/text.py::hashed_char_ngram_features: bucket = first-32-bits
mod 256, sign = 9th-nibble parity, char trigrams of lower(text)), fits
a multinomial logistic regression in numpy, quantizes the weights to
integers (x2000, round-half-even), and prints the frozen weight module
(northwind_etl_spark/functions/langid_weights.py).

Deterministic: numpy RandomState(7) everywhere; re-running reproduces
the committed weights bit-for-bit.  The fixture's documents.lang column
is RANDOM (measured: held-out accuracy == majority baseline), so these
weights are deliberately NOT trained on it — they are trained on text
with real language signal so the operator is a working scorer, and the
oracle checks its arithmetic (exact integer margins), not its accuracy
on the synthetic fixture.
"""
import hashlib
import numpy as np

B = 256
LANGS = ["de", "en", "es", "fr", "zh"]

WORDS = {
    "en": """the and of to in is that it was for on are with as they be at
        one have this from or had by not but what some we can out other
        were all there when up use your how said an each she which do
        their time if will way about many then them would write like so
        these her long make thing see him two has look more day could go
        come did my no most who over know than call first people may down
        side been now find any new part""".split(),
    "de": """der die das und ist ich nicht sie es ein eine zu den mit auf
        für von dem sich des auch an werden aus er hat dass war wird sind
        noch wie einem über einen so zum haben nur oder um aber vor bei
        durch kann man mehr wenn schon als dann ihm ihre nach wir doch
        ihr ja mich kein wurde hier alle wieder mein gegen vom können
        schnell unter sein ihn zwei etwas nichts diese ohne sehr""".split(),
    "es": """el los las y es de la en que a no un una por con para se del
        al lo como más pero sus le ya o este sí porque esta entre cuando
        muy sin sobre también me hasta hay donde quien desde todo nos
        durante todos uno les ni contra otros ese eso ante ellos e esto
        mí antes algunos qué unos yo otro otras otra él tanto esa estos
        mucho quienes nada muchos cual poco ella estar estas algunas algo
        nosotros""".split(),
    "fr": """le la les et est de un une dans que qui pour sur avec pas ce
        il elle au aux du des en ne se plus par mais ou si sont nous vous
        leur bien sans peut tout comme être fait été très aussi faire
        autre deux même notre ses mes ces votre cette aux quand dont où
        donc ainsi encore entre toute toutes tous après avant chez
        chaque depuis pendant peu sous""".split(),
    "zh": """de5 shi4 le5 he2 zai4 bu4 wo3 you3 ta1 zhe4 zhong1 da4 lai2
        shang4 guo2 ge4 dao4 shuo1 men5 wei2 zi5 ni3 sheng1 hao3 ye3 hui4
        jiu4 dou1 shi2 neng2 dui4 xia4 xiao3 tian1 qu4 nian2 na4 yao4
        hou4 ren2 mei2 hen3 kan4 qi3 hai2 duo1 me5 xing2 xiang3 zhi1
        xin1 ming2 ba3 wen2 ti2 rang4 zou3 dian3 jian4 kai1 zuo4""".split(),
}


def featurize(text: str) -> np.ndarray:
    v = np.zeros(B)
    t = text.lower()
    for i in range(len(t) - 2):
        d = hashlib.md5(t[i : i + 3].encode()).hexdigest()
        v[int(d[:8], 16) % B] += 1 if int(d[8], 16) % 2 == 0 else -1
    return v


def main() -> None:
    rng = np.random.RandomState(7)
    docs, labels = [], []
    for li, lang in enumerate(LANGS):
        words = WORDS[lang]
        for _ in range(1500):
            n = rng.randint(15, 40)
            docs.append(" ".join(words[j] for j in rng.randint(0, len(words), n)))
            labels.append(li)
    X = np.array([featurize(t) for t in docs])
    y = np.array(labels)
    idx = rng.permutation(len(y))
    tr, te = idx[: int(0.8 * len(y))], idx[int(0.8 * len(y)) :]
    Xn = X / (np.abs(X).sum(1, keepdims=True) + 1e-9)
    W = np.zeros((len(LANGS), B))
    I = np.eye(len(LANGS))
    for _ in range(400):
        Z = Xn[tr] @ W.T
        Z -= Z.max(1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(1, keepdims=True)
        W -= 4.0 * ((P - I[y[tr]]).T @ Xn[tr] / len(tr) + 1e-4 * W)
    acc = ((Xn[te] @ W.T).argmax(1) == y[te]).mean()
    Wq = np.round(W * 2000).astype(int)
    accq = ((X[te] @ Wq.T).argmax(1) == y[te]).mean()
    print(f"# held-out accuracy: float {acc:.4f}  quantized-int {accq:.4f}")
    print("LANGID_LANGS =", tuple(LANGS))
    print("LANGID_WEIGHTS = {")
    for li, lang in enumerate(LANGS):
        row = ", ".join(str(int(w)) for w in Wq[li])
        print(f'    "{lang}": ({row}),')
    print("}")


if __name__ == "__main__":
    main()
