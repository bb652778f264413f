package graft.schema

/** Input data model: the nested NEAR block document
  * (`BlockWithTxHashes`), as consumed by the reference throughout
  * /root/reference/src/actions.rs:341-670 and
  * /root/reference/src/transactions.rs:175-354 (shape documented in
  * /root/repo/FIXTURES.md §1; originates in the public neardata JSON
  * feed).
  *
  * Representation choices (Spark-first, not a Rust port):
  *  - Rust enums become structs of nullable variant fields: a
  *    `ReceiptView.receipt` is Action XOR Data (`actionReceipt` /
  *    `dataReceipt`, exactly one non-null); an `ExecutionStatusView` is
  *    one of 4 variants (`successValue` / `successReceiptId` /
  *    `failure` / unknown-when-all-null). Catalyst prunes unused
  *    variant branches; a sealed-trait ADT would force kryo encoders
  *    and kill column pruning.
  *  - byte fields (`args`, `code`, `data`, `SuccessValue`) carry
  *    base64 text, as in the wire JSON; decoding happens in the
  *    extract expressions (Exprs.textOrBase64).
  *  - u128 amounts (`deposit`, `gas_price`, `tokens_burnt`) carry
  *    decimal strings, cast to Decimal(38,0) on output (documented
  *    deviation, SURVEY.md §7.4-3).
  *  - `timestamp_nanosec` stays a Long (SURVEY.md §7.4-4).
  */
final case class FunctionCallPermissionView(
    allowance: Option[String],
    receiver_id: String,
    method_names: Seq[String])

/** `permission` of an access key: FunctionCall-restricted when
  * `function_call` is set, FullAccess otherwise. */
final case class AccessKeyPermissionView(
    function_call: Option[FunctionCallPermissionView])

final case class AccessKeyView(
    nonce: Long,
    permission: AccessKeyPermissionView)

/** One of 14 action kinds (/root/reference/src/actions.rs:483-505);
  * `kind` holds the canonical SCREAMING_SNAKE name (F9: names, not u8
  * codes, are canonical — README.md:131,242), variant payload fields
  * are null unless that kind uses them. */
final case class ActionView(
    kind: String,
    code: Option[String], // DEPLOY_CONTRACT (base64)
    method_name: Option[String], // FUNCTION_CALL
    args: Option[String], // FUNCTION_CALL (base64)
    gas: Option[Long], // FUNCTION_CALL
    deposit: Option[String], // FUNCTION_CALL | TRANSFER (u128 str)
    stake: Option[String], // STAKE (u128 str)
    public_key: Option[String], // STAKE | ADD_KEY | DELETE_KEY
    access_key: Option[AccessKeyView], // ADD_KEY
    beneficiary_id: Option[String]) // DELETE_ACCOUNT

object ActionKind {
  val all: Seq[String] = Seq(
    "CREATE_ACCOUNT", "DEPLOY_CONTRACT", "FUNCTION_CALL", "TRANSFER",
    "STAKE", "ADD_KEY", "DELETE_KEY", "DELETE_ACCOUNT", "DELEGATE",
    "NON_REFUNDABLE_STORAGE_TRANSFER", "DEPLOY_GLOBAL_CONTRACT",
    "DEPLOY_GLOBAL_CONTRACT_BY_ACCOUNT_ID", "USE_GLOBAL_CONTRACT",
    "USE_GLOBAL_CONTRACT_BY_ACCOUNT_ID")
  /** name ↔ u8 wire code map kept for any future native sink
    * (/root/reference/src/actions.rs:29-46). */
  val code: Map[String, Int] = all.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
}

/** 4-variant execution status (/root/reference/src/actions.rs:369-389):
  * exactly one of the three fields set, or none = Unknown. */
final case class ExecutionStatusView(
    success_value: Option[String], // base64 bytes
    success_receipt_id: Option[String],
    failure: Option[String]) // JSON-serialized error

final case class ExecutionOutcomeView(
    receipt_ids: Seq[String],
    status: ExecutionStatusView,
    gas_burnt: Long,
    tokens_burnt: String, // u128 str
    logs: Seq[String],
    executor_id: String)

final case class ExecutionOutcomeWithIdView(
    id: String,
    block_hash: String,
    outcome: ExecutionOutcomeView)

final case class ActionReceiptView(
    signer_id: String,
    signer_public_key: String,
    input_data_ids: Seq[String],
    actions: Seq[ActionView],
    gas_price: String, // u128 str
    is_promise_yield: Boolean)

final case class DataReceiptView(
    data_id: String,
    data: Option[String], // base64 bytes
    is_promise_resume: Boolean)

/** Action XOR Data (GlobalContractDistribution receipts are modeled as
  * both-null — the reference skips them, src/actions.rs:627,667). */
final case class ReceiptView(
    predecessor_id: String,
    receiver_id: String,
    receipt_id: String,
    action: Option[ActionReceiptView],
    data: Option[DataReceiptView])

final case class SignedTransactionView(
    hash: String,
    signer_id: String,
    public_key: String,
    nonce: Long,
    receiver_id: String,
    actions: Seq[ActionView],
    signature: String)

final case class IndexerTransactionWithOutcome(
    transaction: SignedTransactionView,
    outcome: ExecutionOutcomeWithIdView)

final case class ReceiptExecutionOutcome(
    tx_hash: Option[String],
    receipt: ReceiptView,
    execution_outcome: ExecutionOutcomeWithIdView)

final case class ChunkView(
    shard_id: Long,
    transactions: Seq[IndexerTransactionWithOutcome],
    receipts: Seq[ReceiptView])

final case class ShardView(
    shard_id: Long,
    chunk: Option[ChunkView],
    receipt_execution_outcomes: Seq[ReceiptExecutionOutcome])

final case class BlockHeaderView(
    height: Long,
    hash: String,
    prev_hash: String,
    prev_height: Option[Long],
    timestamp_nanosec: Long,
    epoch_id: String,
    chunks_included: Long,
    signature: String,
    latest_protocol_version: Int)

final case class BlockView(author: String, header: BlockHeaderView)

final case class BlockWithTxHashes(block: BlockView, shards: Seq[ShardView])

object Blocks {
  import org.apache.spark.sql.{Encoder, Encoders}
  implicit val encoder: Encoder[BlockWithTxHashes] =
    Encoders.product[BlockWithTxHashes]
  val schema: org.apache.spark.sql.types.StructType = encoder.schema
}
