"""Corpus: a fluent, lazy pipeline facade over the training-data operators.

Every stage delegates to the underlying operator module and returns a new
``Corpus`` wrapping a transformed (still lazy) DataFrame, so a cleaning
pipeline reads the way it is designed:

    from timefence_spark import Corpus

    clean = (
        Corpus(docs)                       # id_col="doc_id", text_col="text"
        .dedup_exact()
        .filter_quality(min_score=0.75)
        .filter_languages(["en", "de"])
        .decontaminate(benchmark_df)
        .redact_pii()
        .filter_blocked_domains(["spam.example.com"])
        .mixture({"src0": 1.0}, default_fraction=0.1)
        .split({"train": 0.9, "val": 0.1})
    )
    clean.df.write.parquet(...)

Nothing executes until an action runs on ``.df`` — Catalyst sees the whole
chain, so column pruning reaches the scan and filter stages stay scan-side
(see docs/concepts/pipeline.md). Stages that compute row-level signals
(quality, language, PII) keep the corpus schema by semi-joining the
surviving ids, never shuffling the text column.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timefence_spark.operators import dedup, packing, pii, sampling, text, web


class Corpus:
    """A document corpus (id + text + any payload columns) with chainable
    cleaning/packing stages. Immutable: every stage returns a new Corpus."""

    def __init__(
        self, df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
    ):
        if id_col not in df.columns or text_col not in df.columns:
            raise ValueError(
                f"Corpus needs columns {id_col!r} and {text_col!r}; "
                f"got {df.columns}"
            )
        self.df = df
        self.id_col = id_col
        self.text_col = text_col

    @classmethod
    def from_crawl(
        cls,
        spark,
        path: str,
        *,
        warc_types: tuple[str, ...] = ("response",),
        strip: bool = True,
    ) -> "Corpus":
        """A Corpus straight from WARC crawl archives: read_warc ->
        keep ``warc_types`` records -> http_body (expression-only HTTP
        header strip) -> optional strip_html. Documents are keyed by a
        deterministic (file, record) id: ``xxhash64(warc_file,
        record_idx)`` — stable across reruns and partitionings, unique
        per record. The URI survives as ``target_uri`` for domain
        filtering. One lazy chain; nothing executes until an action."""
        from timefence_spark.operators.web import strip_html
        from timefence_spark.sources.warc import http_body, read_warc

        recs = read_warc(spark, path).where(
            F.col("warc_type").isin(list(warc_types))
        )
        docs = recs.select(
            F.xxhash64("warc_file", "record_idx").alias("doc_id"),
            "warc_file",
            "target_uri",
            http_body(F.col("payload")).alias("text"),
        )
        if strip:
            docs = strip_html(docs, id_col="doc_id", text_col="text")
        return cls(docs)

    def _wrap(self, df: DataFrame) -> "Corpus":
        return Corpus(df, id_col=self.id_col, text_col=self.text_col)

    def _keep_ids(self, ids: DataFrame) -> "Corpus":
        return self._wrap(self.df.join(ids, self.id_col, "left_semi"))

    # ---- dedup -----------------------------------------------------------

    def dedup_exact(self) -> "Corpus":
        """Keep one document (min id) per exact text content."""
        ids = dedup.exact_survivor_ids(
            self.df, id_col=self.id_col, content_cols=[self.text_col]
        )
        return self._keep_ids(ids)

    def dedup_urls(
        self, *, url_col: str = "url", strip_www: bool = False
    ) -> "Corpus":
        """Keep one document (min id) per CANONICAL URL — the cheap
        crawl re-fetch filter that runs before content-level dedup
        (web.canonicalize_url folds scheme/host case, default ports,
        tracking params, param order, fragments and trailing slashes).
        Documents with a NULL ``url_col`` are all kept."""
        from timefence_spark.operators import web

        ids = web.url_dedup(
            self.df, id_col=self.id_col, url_col=url_col,
            strip_www=strip_www,
        ).select(self.id_col)
        return self._keep_ids(ids)

    def dedup_near(self, *, keep: str = "min_id", **minhash_kwargs) -> "Corpus":
        """Transitive MinHash-LSH near-dup removal. ``keep='min_id'``
        keeps the smallest id per component; ``keep='best'`` keeps the
        highest quality_score (see dedup.dedup_keep_best)."""
        if keep == "best":
            ids = dedup.dedup_keep_best(
                self.df, id_col=self.id_col, text_col=self.text_col,
                **minhash_kwargs,
            ).select(self.id_col)
        elif keep == "min_id":
            comps = dedup.minhash_components(
                self.df, id_col=self.id_col, text_col=self.text_col,
                **minhash_kwargs,
            )
            ids = comps.where(
                F.col(self.id_col) == F.col("component_id")
            ).select(self.id_col)
        else:
            raise ValueError(f"keep must be 'min_id' or 'best', got {keep!r}")
        return self._keep_ids(ids)

    def dedup_semantic(
        self,
        embeddings: DataFrame,
        *,
        vec_col: str = "embedding",
        n_clusters: int = 16,
        threshold: float = 0.9,
        **semantic_kwargs,
    ) -> "Corpus":
        """SemDeDup-style semantic near-dup removal: ``embeddings`` is a
        (id, vector) table keyed by this corpus's ``id_col`` (typically
        precomputed by an embedding model over the same documents). Drops
        every document whose embedding has a within-cluster cosine
        neighbor >= ``threshold`` with a smaller id (the pairwise policy
        of :func:`similarity.semantic_dedup`). Documents WITHOUT an
        embedding row are kept — no vector, no evidence of redundancy
        (the keep-unscored policy of filter_fluency/filter_classifier).

        The embeddings are semi-joined to the corpus's CURRENT ids
        before pairing (ADVICE r7): a stale side-table row must not drop
        a live document whose only near-duplicate was itself removed by
        an earlier pipeline stage — that would leave no surviving copy
        of the content. Clustering/pairing therefore see live documents
        only.
        """
        from timefence_spark.operators import similarity

        live = embeddings.select(F.col(self.id_col), F.col(vec_col)).join(
            self.df.select(self.id_col), self.id_col, "left_semi"
        )
        losers = (
            similarity.semantic_dup_pairs(
                live,
                id_col=self.id_col, vec_col=vec_col,
                n_clusters=n_clusters, threshold=threshold,
                **semantic_kwargs,
            )
            .select(F.col("id_b").alias(self.id_col))
            .distinct()
        )
        return self._wrap(self.df.join(losers, self.id_col, "left_anti"))

    def decontaminate_semantic(
        self,
        embeddings: DataFrame,
        bench_embeddings: DataFrame,
        *,
        vec_col: str = "embedding",
        n_clusters: int = 16,
        threshold: float = 0.9,
        **kwargs,
    ) -> "Corpus":
        """Drop documents whose embedding is a semantic near-duplicate
        of a benchmark item — the embedding-level sibling of
        :meth:`decontaminate` (paraphrased eval items that share no
        n-gram still collide in embedding space). ``embeddings`` is the
        corpus-side (id, vector) table (semi-joined to the corpus's
        CURRENT ids, same stale-row rule as dedup_semantic);
        ``bench_embeddings`` the held-out set's. Documents without an
        embedding row are kept (keep-unscored policy)."""
        from timefence_spark.operators import similarity

        live = embeddings.select(F.col(self.id_col), F.col(vec_col)).join(
            self.df.select(self.id_col), self.id_col, "left_semi"
        )
        hits = (
            similarity.semantic_contamination_pairs(
                live, bench_embeddings, id_col=self.id_col,
                vec_col=vec_col, n_clusters=n_clusters,
                threshold=threshold, **kwargs,
            )
            .select(F.col("corpus_id").alias(self.id_col))
            .distinct()
        )
        return self._wrap(self.df.join(hits, self.id_col, "left_anti"))

    # ---- quality / language / contamination ------------------------------

    def filter_quality(self, *, min_score: float = 0.75, **kwargs) -> "Corpus":
        """Drop documents under the composite quality score."""
        ids = (
            text.quality_score(
                self.df, id_col=self.id_col, text_col=self.text_col, **kwargs
            )
            .where(F.col("quality_score") >= min_score)
            .select(self.id_col)
        )
        return self._keep_ids(ids)

    def filter_gopher(self, **kwargs) -> "Corpus":
        """Keep only documents passing the Gopher quality rules."""
        ids = (
            text.gopher_quality(
                self.df, id_col=self.id_col, text_col=self.text_col, **kwargs
            )
            .where(F.col("gopher_pass"))
            .select(self.id_col)
        )
        return self._keep_ids(ids)

    def filter_languages(self, langs: list[str], **kwargs) -> "Corpus":
        """Keep documents whose marker-heuristic language PREDICTION
        (``lang_pred`` from ``text.lang_id``) is in ``langs``. Note the
        column name: filtering on a bare ``lang`` would silently resolve
        against an input metadata column of that name if one exists."""
        ids = (
            text.lang_id(
                self.df, id_col=self.id_col, text_col=self.text_col, **kwargs
            )
            .where(F.col("lang_pred").isin(list(langs)))
            .select(self.id_col)
        )
        return self._keep_ids(ids)

    def filter_fluency(
        self, *, max_nll: float, lm=None, model: str = "unigram", **kwargs
    ) -> "Corpus":
        """Drop documents whose mean NLL exceeds ``max_nll`` — the
        CCNet-style fluency gate (score against ``lm`` or the corpus's
        own statistics). ``model='unigram'`` (default) scores with
        text.unigram_logprob; ``model='bigram'`` with the interpolated
        text.bigram_logprob (``lm`` is then a (w_prev, word,
        n_occurrences) table from text.bigram_frequencies; pass
        ``lm_unigram=`` through ``kwargs`` for the backoff table);
        ``model='trigram'`` with the Kneser-Ney text.trigram_logprob
        (``lm`` = text.trigram_frequencies output; ``lm_bigram=``
        through ``kwargs``); ``model='5gram'`` (or any '<n>gram',
        3-9) with the KenLM-grade text.ngram_logprob — pass
        ``min_count=`` / the full ``lms=`` ladder through ``kwargs``.

        Unscored documents are KEPT — token-less docs under 'unigram',
        docs with < 2 tokens under 'bigram', < 3 under 'trigram' — the
        gate measures fluency, not emptiness, mirroring filter_pii's
        keep-NULL-text policy. Chain ``filter_quality`` first to drop
        empties. Implemented as an anti-join on the over-threshold ids
        so unscored documents pass through."""
        if model == "unigram":
            scored = text.unigram_logprob(
                self.df, id_col=self.id_col, text_col=self.text_col,
                lm=lm, **kwargs,
            )
        elif model == "bigram":
            scored = text.bigram_logprob(
                self.df, id_col=self.id_col, text_col=self.text_col,
                lm=lm, **kwargs,
            )
        elif model == "trigram":
            scored = text.trigram_logprob(
                self.df, id_col=self.id_col, text_col=self.text_col,
                lm=lm, **kwargs,
            )
        elif _re.fullmatch(r"[3-9]gram", model or ""):
            # '5gram' etc.: KenLM-grade KN ladder (text.ngram_logprob);
            # an external LM is the full lms= ladder via kwargs.
            if lm is not None:
                raise ValueError(
                    f"model={model!r} takes its external LM as the "
                    "full lms= ladder (see text.ngram_logprob), not lm="
                )
            scored = text.ngram_logprob(
                self.df, id_col=self.id_col, text_col=self.text_col,
                n=int(model[0]), **kwargs,
            )
        else:
            raise ValueError(
                f"model must be 'unigram', 'bigram', 'trigram', or "
                f"'<n>gram' (3-9), got {model!r}"
            )
        drop = scored.where(F.col("mean_nll") > max_nll).select(self.id_col)
        return self._wrap(self.df.join(drop, self.id_col, "left_anti"))

    def embed(
        self, *, dims: int = 64, ngram: int = 1, **kwargs
    ) -> DataFrame:
        """Deterministic hashing-trick embeddings for this corpus
        (text.hash_embed: signed feature hashing, L2-normalized) — the
        (id, embedding) table :meth:`dedup_semantic` /
        :meth:`decontaminate_semantic` and the similarity operators
        consume, with no external model. Documents with zero tokens
        emit no row (they then pass semantic stages unscored, the
        keep-unscored policy). A trained-model embedder slots in at the
        same (id, vector) boundary."""
        return text.hash_embed(
            self.df, id_col=self.id_col, text_col=self.text_col,
            dims=dims, ngram=ngram, **kwargs,
        )

    def train_quality_classifier(self, *, label_col: str, **kwargs) -> dict:
        """Train a LEARNED quality classifier from labeled rows of this
        corpus (text.fit_classifier_hashed — logistic regression over
        hashed features, the DCLM / fineweb-edu-style filter; VERDICT
        r12 item 6). ``label_col`` marks the "looks like reference
        text" seed set; returns the model dict
        (weights/bias/ngram/hash_fn/normalize) —
        feed it to :meth:`score_quality_classifier`, persist it as
        JSON (it is a literal weight vector), or reuse it across
        corpus snapshots: the hashed feature space is fixed by
        construction, so no vocabulary drifts out from under the
        model."""
        return text.fit_classifier_hashed(
            self.df, id_col=self.id_col, text_col=self.text_col,
            label_col=label_col, **kwargs,
        )

    def score_quality_classifier(
        self, model: dict, *, out_col: str = "clf_score"
    ) -> DataFrame:
        """Score every document under a :meth:`train_quality_classifier`
        model (text.hashed_classifier_score) -> (id, out_col). Join
        back on the id and threshold to filter; documents that embed to
        no grams produce no row (keep-unscored policy)."""
        return text.hashed_classifier_score(
            self.df, id_col=self.id_col, text_col=self.text_col,
            weights=model["weights"], bias=model["bias"],
            ngram=model.get("ngram", 1),
            hash_fn=model.get("hash_fn", "xxhash64"),
            normalize=model.get("normalize", True),
            out_col=out_col,
        )

    def code_signals(self, **kwargs) -> DataFrame:
        """Code-vs-prose routing signals per document
        (text.code_signals): join back on the id to split the corpus
        into code and prose streams (different dedup granularity and
        mixing weights downstream)."""
        return text.code_signals(
            self.df, id_col=self.id_col, text_col=self.text_col, **kwargs
        )

    def stats(self, **kwargs) -> DataFrame:
        """One-row corpus health summary (text.corpus_stats): docs,
        empties, chars, tokens, mean/p50/p90 token counts — the log line
        to emit before and after each cleaning stage. ``exact=False``
        switches percentiles to the bounded-memory sketch at petabyte
        scale."""
        return text.corpus_stats(
            self.df, id_col=self.id_col, text_col=self.text_col, **kwargs
        )

    def filter_gram_duplication(
        self, *, max_frac: float, n: int = 13, **kwargs
    ) -> "Corpus":
        """Drop documents whose cross-corpus n-gram duplication rate
        exceeds ``max_frac`` (text.gram_duplication — the Lee et al.
        2022 memorization-risk gate; catches boilerplate-heavy docs the
        near-dup banding admits). Documents with fewer than ``n`` tokens
        have no full grams to judge and are KEPT, mirroring
        filter_fluency's keep-unscored policy — implemented as the same
        anti-join on over-threshold ids."""
        scored = text.gram_duplication(
            self.df, id_col=self.id_col, text_col=self.text_col, n=n,
            **kwargs,
        )
        drop = scored.where(F.col("dup_frac") > max_frac).select(
            self.id_col
        )
        return self._wrap(self.df.join(drop, self.id_col, "left_anti"))

    def fluency_buckets(self, **kwargs) -> DataFrame:
        """Label every scored document head/middle/tail by LM-fluency
        percentile (see text.fluency_buckets — the CCNet tercile
        partition). Returns the (id, mean_nll, bucket) DataFrame; join
        back on the id to carve the corpus."""
        return text.fluency_buckets(
            self.df, id_col=self.id_col, text_col=self.text_col, **kwargs
        )

    def filter_fluency_buckets(
        self,
        keep: tuple[str, ...] | list[str] = ("head",),
        *,
        strata_col: str | None = None,
        **kwargs,
    ) -> "Corpus":
        """Keep only documents in the given CCNet fluency bucket(s) —
        ``keep=('head',)`` trains on the most fluent tercile,
        ``('head', 'middle')`` drops only the tail. Unscored (token-less)
        documents are KEPT, mirroring ``filter_fluency``'s keep-unscored
        policy: implemented as an anti-join on the scored-and-excluded
        ids."""
        bad = set(keep) - {"head", "middle", "tail"}
        if bad or not keep:
            raise ValueError(
                f"keep must name buckets from head/middle/tail, got {keep!r}"
            )
        drop = (
            text.fluency_buckets(
                self.df, id_col=self.id_col, text_col=self.text_col,
                strata_col=strata_col, **kwargs,
            )
            .where(~F.col("bucket").isin(list(keep)))
            .select(self.id_col)
        )
        return self._wrap(self.df.join(drop, self.id_col, "left_anti"))

    def filter_classifier(
        self, *, min_score: float, weights=None, weights_df=None,
        bias: float = 0.0,
    ) -> "Corpus":
        """Keep documents scoring at least ``min_score`` under the linear
        unigram classifier (see text.classifier_score) — the
        fasttext-style "reference-like text" gate.

        Zero-token (NULL-text) documents are KEPT, mirroring
        ``filter_fluency``'s keep-unscored policy: the gate measures
        reference-likeness, not emptiness, and a doc with no tokens gives
        the classifier no evidence either way (its nominal score,
        ``sigmoid(bias)``, is a property of the model, not the doc).
        Chain ``filter_quality`` first to drop empties. Implemented as an
        anti-join on the scored-and-below-threshold ids so token-less
        documents pass through."""
        drop = (
            text.classifier_score(
                self.df, id_col=self.id_col, text_col=self.text_col,
                weights=weights, weights_df=weights_df, bias=bias,
            )
            .where((F.col("n_tokens") > 0) & (F.col("clf_score") < min_score))
            .select(self.id_col)
        )
        return self._wrap(self.df.join(drop, self.id_col, "left_anti"))

    def train_classifier(
        self, *, label_col: str, smoothing: float = 1.0, min_count: int = 1
    ) -> DataFrame:
        """Fit a Naive-Bayes (word, weight) table from a label column on
        this corpus (see text.fit_classifier) — feed the result into
        ``filter_classifier(weights_df=...)`` to close the
        label -> train -> score loop. Returns the weights DataFrame, not
        a Corpus (the schema changes)."""
        return text.fit_classifier(
            self.df, id_col=self.id_col, text_col=self.text_col,
            label_col=label_col, smoothing=smoothing, min_count=min_count,
        )

    def train_bpe(
        self, *, n_merges: int = 100, checkpoint_every: int = 10,
        merges_per_round: int = 1, pretokenize: str = "whitespace",
    ) -> list[tuple[str, str]]:
        """Learn a BPE merge table FROM this corpus (distributed
        Sennrich trainer, see bpe.train_bpe_spark) — feed it into
        ``with_token_counts(tokenizer_fn=bpe.make_token_counter(m))``
        to close the train -> tokenize loop with a corpus-fitted
        tokenizer instead of the vendored demo merges.
        ``merges_per_round`` batches driver round-trips for large
        vocabularies; ``pretokenize='byte'`` trains byte-level BPE
        over whitespace words, ``pretokenize='gpt2'`` the true GPT-2
        recipe (published split regex + Ġ space convention, HF
        ByteLevel-exportable; see bpe.train_bpe_spark). Returns the
        merge list (driver-side, vocabulary-bounded), not a Corpus."""
        from timefence_spark.operators import bpe

        return bpe.train_bpe_spark(
            self.df, text_col=self.text_col, n_merges=n_merges,
            checkpoint_every=checkpoint_every,
            merges_per_round=merges_per_round, pretokenize=pretokenize,
        )

    def train_unigram(
        self, *, vocab_size: int = 200, max_piece_len: int = 4,
        seed_size: int = 100_000, em_iters: int = 2,
    ) -> list[tuple[str, int, int]]:
        """Learn a unigram-LM (SentencePiece-style) tokenizer FROM this
        corpus (Kudo 2018 hard-EM trainer, see
        unigram.train_unigram_spark) — the other half of the tokenizer
        story next to :meth:`train_bpe`. Returns the model as
        (piece, count, logp_micro) rows ordered by (count desc, piece)
        — row index = token id; feed it to
        unigram.encode_documents_unigram. Driver-side,
        vocabulary-bounded; not a Corpus."""
        from timefence_spark.operators import unigram

        return unigram.train_unigram_spark(
            self.df, text_col=self.text_col, vocab_size=vocab_size,
            max_piece_len=max_piece_len, seed_size=seed_size,
            em_iters=em_iters,
        )

    def train_wordpiece(
        self, *, n_merges: int = 100, checkpoint_every: int = 10,
    ) -> list[tuple[str, str]]:
        """Learn a WordPiece tokenizer FROM this corpus (Schuster &
        Nakajima 2012 likelihood-scored merges with ##-continuation
        symbols, see wordpiece.train_wordpiece_spark) — the third leg
        of the tokenizer story next to :meth:`train_bpe` and
        :meth:`train_unigram`. Returns the merge list; build the
        encoder vocabulary with wordpiece.wordpiece_pieces(merges,
        wordpiece.wordpiece_alphabet_spark(df)) and encode with
        wordpiece.encode_documents_wordpiece. Driver-side,
        vocabulary-bounded; not a Corpus."""
        from timefence_spark.operators import wordpiece

        return wordpiece.train_wordpiece_spark(
            self.df, text_col=self.text_col, n_merges=n_merges,
            checkpoint_every=checkpoint_every,
        )

    def rank_bm25(self, query: str, **kwargs) -> DataFrame:
        """Score every matching document against ``query`` with Okapi
        BM25 (see text.bm25_score) — keyword-targeted subset pulls.
        Returns the scored (id, n_terms_matched, bm25) DataFrame, not a
        Corpus; sort/limit downstream and semi-join back on the id to
        materialize the subset."""
        return text.bm25_score(
            self.df, id_col=self.id_col, text_col=self.text_col,
            query=query, **kwargs,
        )

    def top_ngrams(
        self, *, n: int = 3, top_k: int | None = 100, min_docs: int = 2
    ) -> DataFrame:
        """Mine recurring word n-grams (boilerplate candidates: nav
        chrome, cookie banners, license headers) — see
        text.ngram_frequencies. Returns the (ngram, n_occurrences,
        n_docs) table head, not a Corpus; curate it into the line/span
        blocklists the dedup stages consume."""
        return text.ngram_frequencies(
            self.df, id_col=self.id_col, text_col=self.text_col,
            n=n, top_k=top_k, min_docs=min_docs,
        )

    def filter_substring_dup(
        self, *, max_dup_fraction: float, k: int = 8, scope: str = "corpus"
    ) -> "Corpus":
        """Drop documents whose duplicated k-token-window fraction
        exceeds ``max_dup_fraction`` (exact-substring duplication
        signal; see dedup.duplicate_spans). Short docs (< k tokens)
        have fraction 0.0 and are kept."""
        ids = (
            dedup.duplicate_spans(
                self.df, id_col=self.id_col, text_col=self.text_col,
                k=k, scope=scope,
            )
            .where(F.col("dup_fraction") <= max_dup_fraction)
            .select(self.id_col)
        )
        return self._keep_ids(ids)

    def decontaminate(self, benchmark: DataFrame, **kwargs) -> "Corpus":
        """Drop documents sharing word n-grams with the benchmark set."""
        ids = (
            dedup.decontaminate(
                self.df, benchmark, id_col=self.id_col, text_col=self.text_col,
                **kwargs,
            )
            .where(~F.col("contaminated"))
            .select(self.id_col)
        )
        return self._keep_ids(ids)

    # ---- scrubbing -------------------------------------------------------

    def normalize(self, *, lowercase: bool = False) -> "Corpus":
        """Canonicalize the text column: strip control characters,
        collapse whitespace, trim, optionally lowercase."""
        return self._wrap(
            text.normalize_text(
                self.df, id_col=self.id_col, text_col=self.text_col,
                lowercase=lowercase,
            )
        )

    def strip_html(self) -> "Corpus":
        """Extract boilerplate-free text from raw HTML in the text
        column (script/style/comment removal, block tags to newlines,
        entity decode — see web.strip_html). Run FIRST on crawled
        corpora, before any text-quality or dedup stage."""
        from timefence_spark.operators.web import strip_html as _sh

        return self._wrap(
            _sh(self.df, id_col=self.id_col, text_col=self.text_col)
        )

    def dedup_lines(
        self, *, min_len: int = 20, sep: str = "\n", scope: str = "corpus"
    ) -> "Corpus":
        """C4-style line dedup: every line kept only at its first
        occurrence — globally (``scope='corpus'``) or within each
        document (``scope='document'``, repeated-boilerplate removal);
        the text column is rewritten with the surviving lines. Payload
        columns are preserved via a join on id."""
        rebuilt = text.line_dedup(
            self.df, id_col=self.id_col, text_col=self.text_col,
            sep=sep, min_len=min_len, scope=scope,
        ).select(self.id_col, F.col("text").alias("__rebuilt"))
        out = (
            self.df.join(rebuilt, self.id_col)
            .withColumn(self.text_col, F.col("__rebuilt"))
            .drop("__rebuilt")
        )
        return self._wrap(out)

    def remove_substring_dups(
        self, *, k: int = 8, scope: str = "corpus", key_by: str = "text"
    ) -> "Corpus":
        """Exact-substring REMOVAL (the companion to
        ``filter_substring_dup``'s drop-the-document policy): every token
        covered by a duplicated k-token window is cut from the text,
        first occurrences keep theirs — see
        :func:`dedup.remove_duplicate_spans`. Whitespace is normalized
        to single spaces by the rebuild. Payload columns are preserved
        via a join on id."""
        rebuilt = dedup.remove_duplicate_spans(
            self.df, id_col=self.id_col, text_col=self.text_col,
            k=k, scope=scope, key_by=key_by,
        ).select(self.id_col, F.col("text").alias("__rebuilt"))
        out = (
            self.df.join(rebuilt, self.id_col)
            .withColumn(self.text_col, F.col("__rebuilt"))
            .drop("__rebuilt")
        )
        return self._wrap(out)

    def filter_pii(self, *, max_pii: int = 0, rules=None) -> "Corpus":
        """Drop documents with more than ``max_pii`` PII matches (the
        drop-don't-redact policy some pipelines prefer). NULL-text
        documents have zero matches and are kept (pii_signals reports 0,
        never NULL; the coalesce here is belt-and-braces for custom
        rules)."""
        ids = (
            pii.pii_signals(
                self.df, id_col=self.id_col, text_col=self.text_col,
                rules=rules,
            )
            .where(F.coalesce(F.col("n_pii"), F.lit(0)) <= max_pii)
            .select(self.id_col)
        )
        return self._keep_ids(ids)

    def redact_pii(self, rules=None) -> "Corpus":
        """Replace PII spans in the text column in place."""
        out = pii.redact_pii(
            self.df, id_col=self.id_col, text_col=self.text_col,
            out_col="__redacted", rules=rules,
        )
        out = out.withColumn(self.text_col, F.col("__redacted")).drop("__redacted")
        return self._wrap(out)

    def filter_blocked_domains(self, blocklist, **kwargs) -> "Corpus":
        """Drop documents linking to blocklisted domains."""
        return self._wrap(
            web.filter_blocked_domains(
                self.df, blocklist, id_col=self.id_col,
                text_col=self.text_col, **kwargs,
            )
        )

    # ---- sampling / splitting / packing ----------------------------------

    def sample(self, fraction: float, *, salt: str = "", **kwargs) -> "Corpus":
        """Deterministic salted-hash sample."""
        return self._wrap(
            sampling.hash_sample(
                self.df, id_col=self.id_col, fraction=fraction, salt=salt,
                **kwargs,
            )
        )

    def mixture(
        self, fractions: dict[str, float], *, strata_col: str = "source", **kwargs
    ) -> "Corpus":
        """Per-stratum sampling rates (corpus mixture weighting)."""
        return self._wrap(
            sampling.mixture_sample(
                self.df, id_col=self.id_col, strata_col=strata_col,
                fractions=fractions, **kwargs,
            )
        )

    def mixture_tokens(
        self,
        budgets: dict[str, int],
        *,
        token_col: str,
        strata_col: str = "source",
        **kwargs,
    ) -> "Corpus":
        """Token-budget mixture (see sampling.token_budget_sample):
        per-stratum TOKEN quotas instead of document fractions — each
        stratum keeps its hash-order prefix within budget. ``token_col``
        must already hold per-document token counts (token_stats /
        token_count_exact)."""
        return self._wrap(
            sampling.token_budget_sample(
                self.df, id_col=self.id_col, token_col=token_col,
                strata_col=strata_col, budgets=budgets, **kwargs,
            )
        )

    def mixture_temperature(
        self,
        *,
        total_tokens: int,
        token_col: str,
        strata_col: str = "source",
        temperature: float = 1.0,
        **kwargs,
    ) -> "Corpus":
        """Temperature-weighted token mixture (Pile/Gopher rule): split
        ``total_tokens`` across strata ∝ n_s^(1/T)
        (sampling.temperature_budgets — one bounded strata collect),
        then keep each stratum's hash-order prefix within its budget
        (sampling.token_budget_sample)."""
        budgets = sampling.temperature_budgets(
            self.df, strata_col=strata_col, token_col=token_col,
            total_tokens=total_tokens, temperature=temperature,
        )
        return self.mixture_tokens(
            budgets, token_col=token_col, strata_col=strata_col, **kwargs
        )

    def select_dsir(
        self, target: "Corpus | DataFrame", *, n: int, **kwargs
    ) -> "Corpus":
        """DSIR data selection (Xie et al. 2023): keep the ``n``
        documents most like ``target`` by hashed-n-gram importance
        resampling (sampling.dsir_sample — deterministic Gumbel top-k
        over the log-likelihood-ratio weights). ``target`` is a trusted
        corpus (or its DataFrame with the same id/text columns)."""
        tdf = target.df if isinstance(target, Corpus) else target
        out = sampling.dsir_sample(
            self.df, tdf.select(self.id_col, self.text_col),
            id_col=self.id_col, text_col=self.text_col, n=n, **kwargs,
        )
        return self._wrap(out.drop("log_weight", "sample_rank"))

    def split(self, weights: dict[str, float], **kwargs) -> "Corpus":
        """Add a deterministic 'split' assignment column."""
        return self._wrap(
            sampling.split_by_hash(
                self.df, id_col=self.id_col, weights=weights, **kwargs
            )
        )

    def shuffle(self, *, salt: str = "", **kwargs) -> "Corpus":
        """Reproducible global shuffle (see
        sampling.deterministic_shuffle) — order the corpus by salted id
        hash before packing/writing; different salts give independent
        epochs."""
        return self._wrap(
            sampling.deterministic_shuffle(
                self.df, id_col=self.id_col, salt=salt, **kwargs
            )
        )

    # ---- profiling -------------------------------------------------------

    def _report_frame(self):
        """The single chained projection report() aggregates: quality ->
        PII -> language, each carrying prior columns via keep_cols, plus
        the content hash — one scan of the corpus, zero joins. Exposed
        separately so tests can pin the plan shape (exactly one scan)."""
        from pyspark.sql import functions as FF

        q = text.quality_score(
            self.df, id_col=self.id_col, text_col=self.text_col,
            keep_cols=[self.text_col],
        )
        p = pii.pii_signals(
            q, id_col=self.id_col, text_col=self.text_col,
            keep_cols=["n_chars", "n_tokens", "quality_score", self.text_col],
        )
        lang_keys = sorted(text.LANG_MARKERS)
        combined = text.lang_id(
            p, id_col=self.id_col, text_col=self.text_col,
            keep_cols=["n_chars", "n_tokens", "quality_score", "has_pii",
                       self.text_col],
        ).select(
            "n_chars",
            "n_tokens",
            "quality_score",
            "has_pii",
            "lang_pred",
            FF.md5(FF.col(self.text_col).cast("string")).alias("__h"),
        )
        return combined, lang_keys

    def report(self) -> dict:
        """Corpus health profile: row/char/token/quality stats, PII rate,
        exact-duplicate rate, language distribution — all from ONE Spark
        action. The quality, PII, and language operators chain into a
        single scan-side projection (each carries the earlier columns
        through via ``keep_cols`` — no joins, no re-scans), the content
        hash rides the same select, and one aggregate computes every
        number including the fixed-key language counts (the marker
        profile's key set is static, so per-language conditional counts
        replace the old groupBy). Returns plain Python — the numbers a
        pipeline owner checks before burning cluster time on a full
        clean. NULL-text documents count as zero chars/tokens sources of
        nothing: they form one duplicate group and carry no PII."""
        from pyspark.sql import functions as FF

        def _f(v, default=0.0, nd=4):
            return round(float(v), nd) if v is not None else default

        combined, lang_keys = self._report_frame()
        row = combined.agg(
            FF.count(FF.lit(1)).alias("n_docs"),
            FF.avg("n_chars").alias("avg_chars"),
            FF.expr("percentile(n_chars, 0.5)").alias("median_chars"),
            FF.avg("n_tokens").alias("avg_tokens"),
            FF.avg("quality_score").alias("avg_quality"),
            FF.count(FF.when(FF.col("quality_score") >= 0.75, 1)).alias(
                "n_high_quality"
            ),
            FF.count(FF.when(FF.col("has_pii"), 1)).alias("n_pii_docs"),
            # countDistinct skips NULL hashes; all-NULL texts are ONE
            # duplicate group, so add it back explicitly.
            FF.countDistinct("__h").alias("d"),
            FF.max(
                FF.when(FF.col("__h").isNull(), 1).otherwise(0)
            ).alias("has_null"),
            *[
                FF.count(FF.when(FF.col("lang_pred") == k, 1)).alias(f"l_{k}")
                for k in lang_keys
            ],
            FF.count(FF.when(FF.col("lang_pred").isNull(), 1)).alias("l_null"),
        ).first()
        n_docs = int(row["n_docs"] or 0)
        langs = {
            k: int(row[f"l_{k}"]) for k in lang_keys if int(row[f"l_{k}"])
        }
        if int(row["l_null"]):
            langs[None] = int(row["l_null"])
        n_distinct = int(row["d"] or 0) + int(row["has_null"] or 0)
        return {
            "n_docs": n_docs,
            "n_distinct_texts": n_distinct,
            "exact_dup_pct": (
                round(100.0 * (n_docs - n_distinct) / n_docs, 2) if n_docs else 0.0
            ),
            "avg_chars": _f(row["avg_chars"], nd=1),
            "median_chars": _f(row["median_chars"], nd=1),
            "avg_tokens": _f(row["avg_tokens"], nd=1),
            "avg_quality": _f(row["avg_quality"]),
            "high_quality_pct": (
                round(100.0 * int(row["n_high_quality"]) / n_docs, 2)
                if n_docs
                else 0.0
            ),
            "pii_doc_pct": (
                round(100.0 * int(row["n_pii_docs"]) / n_docs, 2) if n_docs else 0.0
            ),
            "languages": langs,
        }

    def with_token_counts(
        self, *, out_col: str = "n_tokens", tokenizer_fn=None
    ) -> "Corpus":
        """Attach an exact token count column (the input to :meth:`pack`'s
        ``token_col``). ``tokenizer_fn=None`` uses the vendored
        deterministic BPE (operators/bpe.py); pass a production
        tokenizer's ``encode``-length for deployment. One Arrow-batched
        mapInPandas stage; every input column rides through it
        (``keep_cols``), so there is no reattach join and duplicate ids
        cannot inflate the corpus."""
        from timefence_spark.operators import bpe

        if out_col in self.df.columns:
            raise ValueError(
                f"with_token_counts out_col {out_col!r} already exists"
            )
        keep = [c for c in self.df.columns if c != self.id_col]
        return self._wrap(
            text.token_count_exact(
                self.df, id_col=self.id_col, text_col=self.text_col,
                tokenizer_fn=tokenizer_fn or bpe.token_count,
                out_col=out_col, keep_cols=keep,
            )
        )

    def chunk(
        self, *, chunk_tokens: int = 512, overlap: int = 0, **kwargs
    ) -> DataFrame:
        """Terminal stage: split documents into (optionally overlapping)
        token-window chunks — RAG/context-window prep; see
        :func:`text.chunk_documents`. Returns the chunk DataFrame (not a
        Corpus — one row per chunk, schema changes)."""
        return text.chunk_documents(
            self.df, id_col=self.id_col, text_col=self.text_col,
            chunk_tokens=chunk_tokens, overlap=overlap, **kwargs,
        )

    def to_sequences(
        self,
        *,
        seq_len: int,
        merges: list[tuple[str, str]] | None = None,
        vocab: list[str] | None = None,
        oov_id: int | None = None,
        unigram_model: list[tuple[str, int, int]] | None = None,
        wordpiece_vocab: list[str] | None = None,
        pretokenize: str = "whitespace",
        num_shards: int = 64,
        salt: str = "",
        hash_fn: str = "xxhash64",
        pad_id: int | None = None,
    ) -> DataFrame:
        """Terminal stage: tokenize every document to integer ids and
        cut the per-shard concatenated id stream into fixed ``seq_len``
        training rows (:func:`packing.pack_sequences`). Returns
        (shard, seq, n_tokens, input_ids) — the ready-to-train form.

        Tokenizer selection: pass ``unigram_model`` (from
        :meth:`train_unigram` / ``unigram.load_unigram_tokenizer``) to
        encode with the unigram Viterbi encoder — a pure-JVM fold, no
        Python stage at all; otherwise BPE via
        :func:`bpe.encode_documents` (vendored merges by default, pass
        :meth:`train_bpe`'s output for a corpus-fitted tokenizer; the
        ``vocab`` from a :func:`bpe.load_tokenizer` artifact freezes
        the id space, with ``oov_id`` for unseen characters — the
        unigram model IS its frozen id space, unknowns encode as -1).
        ``wordpiece_vocab`` (wordpiece.wordpiece_pieces output, ideally
        with the unknown token appended) selects the WordPiece greedy
        encoder — per-distinct-word JVM fold, ids are vocab indexes,
        unknown words encode as the [UNK] entry's index (or -1 when
        absent)."""
        from timefence_spark.operators.packing import pack_sequences

        # Identity, not truthiness: merges=[] must still count as a BPE
        # selection so mixing it with another tokenizer raises.
        chosen = [
            unigram_model is not None,
            wordpiece_vocab is not None,
            merges is not None or vocab is not None,
        ]
        if sum(chosen[:2]) and (chosen[2] or sum(chosen[:2]) > 1):
            raise ValueError(
                "pass exactly one of unigram_model, wordpiece_vocab, "
                "or merges/vocab"
            )
        if unigram_model is not None:
            from timefence_spark.operators import unigram as uni_ops

            encoded = uni_ops.encode_documents_unigram(
                self.df, unigram_model, id_col=self.id_col,
                text_col=self.text_col, output="ids",
                out_col="token_ids",
            )
        elif wordpiece_vocab is not None:
            from timefence_spark.operators import wordpiece as wp_ops

            encoded = wp_ops.encode_documents_wordpiece(
                self.df, wordpiece_vocab, id_col=self.id_col,
                text_col=self.text_col, output="ids",
                out_col="token_ids",
            )
        else:
            from timefence_spark.operators import bpe as bpe_ops

            encoded = bpe_ops.encode_documents(
                self.df, id_col=self.id_col, text_col=self.text_col,
                merges=merges, vocab=vocab, oov_id=oov_id,
                pretokenize=pretokenize,
            )
        return pack_sequences(
            encoded, id_col=self.id_col, ids_col="token_ids",
            seq_len=seq_len, num_shards=num_shards, salt=salt,
            hash_fn=hash_fn, pad_id=pad_id,
        )

    def pack(
        self, *, token_col: str, budget: int, boundaries: bool = True, **kwargs
    ) -> DataFrame:
        """Terminal stage: pack into token-budget chunks.
        ``boundaries=True`` -> next-fit (no document straddles);
        ``False`` -> concatenate-then-cut stream packing.
        Returns the packed DataFrame (not a Corpus — schema changes)."""
        fn = packing.pack_next_fit if boundaries else packing.pack_stream
        return fn(
            self.df, id_col=self.id_col, token_col=token_col, budget=budget,
            **kwargs,
        )

    def write(
        self,
        path: str,
        *,
        format: str = "parquet",
        mode: str = "error",
        partition_by: str | list[str] | None = None,
        compression: str | None = None,
        shuffle_salt: str | None = None,
        cluster_by: str | list[str] | None = None,
        sort_by: str | list[str] | None = None,
        num_files: int | None = None,
    ) -> None:
        """Terminal stage: materialize the corpus. ``format='parquet'``
        (columnar, the pipeline-internal default) or ``'jsonl'``
        (newline-delimited JSON, the interchange format corpora ship in
        — round-trips through ``sources.readers.read_jsonl``).
        ``shuffle_salt`` applies :meth:`shuffle` first, so the files
        come out in that epoch's reproducible order (order holds within
        each part file and across the lexicographic part-file sequence —
        range partition i precedes i+1). ``partition_by`` writes
        hive-style directories (e.g. the 'split' column from
        :meth:`split`); don't combine it with ``shuffle_salt`` if global
        order matters — partition dirs split the ordered stream.

        ``cluster_by`` writes a range-CLUSTERED layout instead (see
        sources.writers.write_clustered): each file owns a disjoint
        key range, so downstream key filters prune by footer min/max
        on any parquet engine. Mutually exclusive with
        ``partition_by``/``shuffle_salt`` (clustering IS an ordering)
        and parquet-only."""
        if cluster_by is not None:
            if partition_by is not None or shuffle_salt is not None:
                raise ValueError(
                    "cluster_by is mutually exclusive with partition_by "
                    "and shuffle_salt"
                )
            if format != "parquet":
                raise ValueError(
                    f"cluster_by requires format='parquet', got {format!r}"
                )
            from timefence_spark.sources.writers import write_clustered

            write_clustered(
                self.df, path, cluster_by=cluster_by, sort_by=sort_by,
                num_files=num_files, mode=mode, compression=compression,
            )
            return
        c = self.shuffle(salt=shuffle_salt) if shuffle_salt is not None else self
        writer = c.df.write.mode(mode)
        if partition_by is not None:
            cols = [partition_by] if isinstance(partition_by, str) else partition_by
            writer = writer.partitionBy(*cols)
        if compression is not None:
            writer = writer.option("compression", compression)
        if format == "parquet":
            writer.parquet(path)
        elif format == "jsonl":
            writer.json(path)
        else:
            raise ValueError(
                f"format must be 'parquet' or 'jsonl', got {format!r}"
            )
