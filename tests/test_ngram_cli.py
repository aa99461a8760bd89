"""ARPA ngram rescoring through the real CLI (the ngram branch of
cmd/lm_rescore.py had zero live coverage while kenlm was absent — the
built-in ARPA scorer makes it runnable everywhere)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARPA = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.5\t<s>\t-0.3
-0.4\thello\t-0.2
-1.5\tworld\t-0.4
-0.9\t</s>
-3.0\t<unk>

\\2-grams:
-0.05\t<s> hello
-0.1\thello world

\\end\\
"""


def test_lm_rescore_with_arpa(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [REPO, os.environ.get("PYTHONPATH", "")]))
    env.pop("PALLAS_AXON_POOL_IPS", None)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    dict_path = tmp_path / "dict"
    dict_path.write_text("hello 0\nworld 1\nword 2\n<unk> 3\n")
    # utt1: the acoustically-best hypothesis ("hello word") is unlikely
    # under the LM; "hello world" must win after rescoring
    nbest = tmp_path / "cv.nbest"
    nbest.write_text("2\nutt1\n"
                     "-0.10\t2\thello word\n"
                     "-0.30\t2\thello world\n")
    out = tmp_path / "best.txt"
    proc = subprocess.run(
        [sys.executable, "cmd/lm_rescore.py", str(nbest), str(out),
         "--lm", str(arpa), "--lm-weight", "0.5",
         "--dict", str(dict_path)], cwd=REPO, env=env,
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    text = out.read_text().strip()
    assert text == "utt1\thello world", text
