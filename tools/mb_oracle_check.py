#!/usr/bin/env python3
"""Multibyte-corpus oracle replay: prove the full oracle suite holds with
non-ASCII documents (no char==byte precondition anywhere).

Builds a twin of <sfDir> whose documents table carries multibyte text —
every 7th doc gains accented Latin (2-byte), CJK (3-byte) and an astral
emoji (4-byte) token — then runs graft.Verify against it and replays the
standard DuckDB compare (tools/check_oracle.py). Every oracle that reads
`documents` is thereby exercised on text where bytes != chars !=
codepoints; all other tables are symlinked unchanged.

Usage: python3 tools/mb_oracle_check.py [sfDir] [workDir]
       (defaults: /root/testdata/sf0.01  /tmp/mbcheck)

Expect the same "N pass, 0 fail" as the plain run. The byte-modeling
queries (mm_ingest/framesample/decode) and the codepoint-modeling ones
(mm_chunks/resize, text family, shingle dedup family) must all stay
green — that is the de-ASCII contract.
"""
import os, subprocess, sys, glob

MB_SUFFIX = " café résumé 日本語 \U0001F389fin"

def build_corpus(sf_dir, work_dir):
    import duckdb
    corpus = os.path.join(work_dir, "corpus")
    os.makedirs(corpus, exist_ok=True)
    for t in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(t)
        dst = os.path.join(corpus, name)
        if name != "documents.parquet" and not os.path.exists(dst):
            os.symlink(t, dst)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || '{MB_SUFFIX}'
                      ELSE text END AS text,
                 lang, source,
                 length(CASE WHEN doc_id % 7 = 0 THEN text || '{MB_SUFFIX}'
                             ELSE text END) AS n_chars
          FROM '{sf_dir}/documents.parquet'
        ) TO '{corpus}/documents.parquet' (FORMAT PARQUET)""")
    n = con.execute(f"""SELECT count(*) FROM '{corpus}/documents.parquet'
        WHERE octet_length(encode(text)) != length(text)""").fetchone()[0]
    assert n > 0, "corpus must contain multibyte rows"
    print(f"multibyte corpus at {corpus}: {n} non-ASCII docs")
    return corpus

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mbcheck"
    corpus = build_corpus(sf_dir, work_dir)
    vout = os.path.join(work_dir, "vout")
    jar = sorted(glob.glob("target/scala-2.13/metofficespark_*.jar"))[-1]
    opens = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in
             ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
              "java.net", "java.nio", "java.util", "java.util.concurrent",
              "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
              "sun.security.action", "sun.util.calendar"]]
    subprocess.run(["java", "-Xmx16g", *opens,
                    "-cp", f"{jar}:/opt/spark/jars/*",
                    "graft.Verify", corpus, vout],
                   check=True, stderr=subprocess.DEVNULL)
    rc = subprocess.run([sys.executable, "tools/check_oracle.py", corpus, vout])
    return rc.returncode

if __name__ == "__main__":
    sys.exit(main())
