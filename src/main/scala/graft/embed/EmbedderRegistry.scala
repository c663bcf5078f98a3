package graft.embed

/**
 * One registry entry: a model NAME (possibly org-qualified, e.g.
 * `jinaai/jina-embeddings-v2-base-code`) resolved to an embedding dim, a
 * kind tag, and an [[Embedder]] factory. In the reference every entry
 * resolves to a SentenceTransformer and the dim is read off the loaded
 * encoder (`draft.py:1-2`); here every entry resolves to the TF-IDF
 * stand-in at the model's published dim, so everything DOWNSTREAM of the
 * encoder — collection sizing, naming, normalized-vs-not handling — has
 * the same name-driven shape as the reference.
 */
final case class ModelSpec(name: String, dim: Int, kind: String = "general") {
  def embedder(normalized: Boolean = true): Embedder =
    new TfIdfEmbedder(dim = dim, normalized = normalized)
}

/**
 * Model registry (SURVEY §1.3 / `embedding_models.yml:1-73`): the
 * reference carries a 24-model YAML registry plus three per-entry-point
 * default models (`main.py:20`, `main2.py:22`, `main3.py:20`); collection
 * dims derive from the chosen model, never hand-passed. This registry
 * pins the same capability: look up by name → `ModelSpec` with the
 * model's embedding dim (the publicly documented dim for each family;
 * the TF-IDF stand-in embeds at that dim so collections size
 * identically), `register` for user-supplied entries, and a
 * `parse`/`registerAll` path for config-file-driven extension mirroring
 * the YAML surface.
 */
object EmbedderRegistry {

  /** Entry-point defaults: A = `main.py:20`, B = `main2.py:22`,
    * C = `main3.py:20`. */
  val default: String = "all-MiniLM-L6-v2"
  val defaultSmallEn: String = "jinaai/jina-embeddings-v2-small-en"
  val defaultCode: String = "ncoop57/codeformer-java"

  private val builtin: Map[String, ModelSpec] = Seq(
    // entry-point defaults
    ModelSpec("all-MiniLM-L6-v2", 384),
    ModelSpec("jinaai/jina-embeddings-v2-small-en", 512, kind = "code"),
    ModelSpec("ncoop57/codeformer-java", 768, kind = "code"),
    // embedding_models.yml:1-73 (kind mirrors its `type` field)
    ModelSpec("stella_en_400M_v5", 1024),
    ModelSpec("learning2_model", 1024),
    ModelSpec("gte-large-en-v1.5", 1024),
    ModelSpec("cde-small-v1", 768),
    ModelSpec("mxbai-embed-large-v1", 1024),
    ModelSpec("UAE-Large-V1", 1024),
    ModelSpec("GIST-large-Embedding-v0", 1024),
    ModelSpec("bge-large-en-v1.5", 1024),
    ModelSpec("b1ade-embed", 1024),
    ModelSpec("MUG-B-1.6", 1024),
    ModelSpec("gte-base-en-v1.5", 768),
    ModelSpec("GIST-Embedding-v0", 768),
    ModelSpec("bge-base-en-v1.5", 768),
    ModelSpec("sf_model_e5", 1024),
    ModelSpec("mxbai-embed-2d-large-v1", 1024),
    ModelSpec("gte-large", 1024),
    ModelSpec("nomic-embed-text-v1", 768),
    ModelSpec("mmlw-e5-base", 768),
    ModelSpec("mmlw-e5-small", 384),
    ModelSpec("mmlw-roberta-base", 768),
    ModelSpec("mmlw-roberta-large", 1024),
    ModelSpec("st-polish-paraphrase-from-distilroberta", 768),
    ModelSpec("distiluse-base-multilingual-cased-v1", 512),
    ModelSpec("jinaai/jina-embeddings-v2-base-code", 768, kind = "code")
  ).map(s => s.name -> s).toMap

  // user-registered entries shadow builtins; driver-side config, so a
  // plain synchronized map (no executor ever touches the registry).
  private val extra = scala.collection.mutable.Map.empty[String, ModelSpec]

  def register(spec: ModelSpec): Unit = synchronized { extra(spec.name) = spec }

  def get(name: String): Option[ModelSpec] =
    synchronized(extra.get(name)).orElse(builtin.get(name))

  def apply(name: String): ModelSpec = get(name).getOrElse(
    throw new IllegalArgumentException(
      s"unknown embedding model '$name'; known: ${known.mkString(", ")} " +
        "(EmbedderRegistry.register adds custom entries)"))

  def known: Seq[String] =
    (builtin.keySet ++ synchronized(extra.keys.toSet)).toSeq.sorted

  /** The `draft.py:1-2` capability: dim lookup by model name. */
  def dimOf(name: String): Int = apply(name).dim

  /**
   * Parse registry config lines — the YAML-registry surface without a
   * YAML dependency. One entry per line: `name dim [kind]`; `#` comments
   * and blank lines ignored. Feed file contents through
   * [[registerAll]] to extend the registry from config.
   */
  def parse(config: String): Seq[ModelSpec] =
    config.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        line.split("\\s+") match {
          case Array(n, d) => ModelSpec(n, d.toInt)
          case Array(n, d, k) => ModelSpec(n, d.toInt, kind = k)
          case _ => throw new IllegalArgumentException(
            s"bad registry line '$line' (want: name dim [kind])")
        }
      }.toSeq

  def registerAll(config: String): Unit = parse(config).foreach(register)
}
