package graft

/** Typed exception hierarchy — the library-consumer contract the
  * reference defines in
  * `src/gapless_deribit_clickhouse/exceptions.py:11-42`
  * (GaplessDeribitError → QueryError / APIError / SchemaError …),
  * re-scoped to this engine's surface: a caller can catch
  * [[GraftException]] to handle every error this library raises on
  * purpose, or the specific subtype to branch on recoverability.
  * Like the reference, errors propagate — no silent catches. The
  * HTTP-side subtypes (CredentialError, RateLimitError,
  * ConnectionError) have no analog here because the billing/API
  * clients are out of scope (SURVEY §2.1 S11).
  */
abstract class GraftException(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

/** Invalid query parameters or an unresolvable query-time reference
  * (unknown snapshot version / tag) — the reference's `QueryError`.
  * Always a caller bug or a stale handle, never retryable. */
final class QueryError(message: String) extends GraftException(message)

/** Ingest-side failure: an unreadable checkpoint, an inconsistent
  * backfill state — the reference's `APIError` family re-scoped to
  * the local ingest surface. */
final class IngestError(message: String) extends GraftException(message)

/** Schema validation or declaration failure — the reference's
  * `SchemaError`. */
final class SchemaError(message: String) extends GraftException(message)
