package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import graft.expr.Exprs
import graft.etl.TxCorrelator.CompletedTx

/** Fan-out of completed transactions to the 5 explorer tables
  * (/root/reference/src/transactions.rs:372-441; DDL README.md:252-332).
  *
  * The reference's per-tx imperative loops become per-row column
  * expressions; the account-set union (A2) — signer ∪ receipt receivers
  * ∪ function-call-arg accounts ∪ event-log accounts — is computed with
  * higher-order array functions entirely inside the row, so building
  * `account_txs` costs ONE explode and no shuffle (the reference's
  * HashSet per tx, re-expressed as array_distinct).
  */
object TxFanout {

  /** POTENTIAL_ACCOUNT_ARGS (/root/reference/src/transactions.rs:21-41). */
  val potentialAccountArgs: Seq[String] = Seq(
    "receiver_id", "account_id", "sender_id", "new_account_id",
    "predecessor_account_id", "contract_id", "owner_id", "token_owner_id",
    "nft_contract_id", "token_account_id", "creator_id", "referral_id",
    "previous_owner_id", "seller_id", "buyer_id", "user_id",
    "beneficiary_id", "staking_pool_account_id", "owner_account_id")

  /** POTENTIAL_EVENTS_ARGS (/root/reference/src/transactions.rs:43-54). */
  val potentialEventsArgs: Seq[String] = Seq(
    "account_id", "owner_id", "old_owner_id", "new_owner_id", "payer_id",
    "farmer_id", "validator_id", "liquidation_account_id", "contract_id",
    "nft_contract_id")

  private def strStruct(fields: Seq[String]) =
    StructType(fields.map(StructField(_, StringType)))

  /** `EventJson` (/root/reference/src/transactions.rs:55-63): version/
    * standard/event/data all REQUIRED — a log missing any contributes
    * no accounts. */
  private val eventJsonSchema = StructType(Seq(
    StructField("version", StringType),
    StructField("standard", StringType),
    StructField("event", StringType),
    StructField("data", ArrayType(strStruct(potentialEventsArgs)))))

  private def validAccounts(arr: Column): Column =
    filter(arr, a => a.isNotNull && Exprs.isValidAccountId(a))

  /** Account candidates probed from one FunctionCall's args JSON
    * (`extract_accounts`, transactions.rs:524-534,549-567). */
  private def accountsFromArgs(argsB64: Column): Column = {
    val parsed = from_json(
      unbase64(argsB64).cast(StringType), strStruct(potentialAccountArgs))
    validAccounts(array(potentialAccountArgs.map(parsed.getField): _*))
  }

  private val emptyStrArray = array().cast(ArrayType(StringType))

  /** Account candidates from one receipt: receiver + every
    * FunctionCall's args accounts (`add_accounts_from_receipt`). */
  private def accountsFromReceipt(receipt: Column): Column =
    concat(
      array(receipt.getField("receiver_id")),
      coalesce(
        flatten(transform(
          filter(
            receipt.getField("action").getField("actions"),
            a => a.getField("kind") === "FUNCTION_CALL"),
          a => accountsFromArgs(a.getField("args")))),
        emptyStrArray))

  /** Account candidates from EVENT_JSON logs
    * (`add_accounts_from_logs`, transactions.rs:536-547). */
  private def accountsFromLogs(logs: Column): Column = {
    val events = transform(
      filter(coalesce(logs, array().cast(ArrayType(StringType))),
        l => l.startsWith(Exprs.EventLogPrefix)),
      l => from_json(l.substr(lit(Exprs.EventLogPrefix.length + 1), length(l)),
        eventJsonSchema))
    flatten(transform(
      filter(events, e =>
        e.getField("version").isNotNull && e.getField("standard").isNotNull &&
          e.getField("event").isNotNull && e.getField("data").isNotNull),
      e => flatten(transform(
        e.getField("data"),
        d => validAccounts(
          array(potentialEventsArgs.map(d.getField): _*))))))
  }

  /** The wide `transactions` table row JSON (`TransactionView`,
    * transactions.rs:120-126) — built with to_json over the typed
    * struct; null fields omitted (canonical form of this engine,
    * F12 note on serde parity). */
  private def transactionJson: Column =
    to_json(struct(
      col("transaction"),
      col("execution_outcome"),
      col("receipts"),
      col("data_receipts")))

  def transactions(txs: Dataset[CompletedTx]): DataFrame =
    txs.toDF().select(
      col("transaction.hash").as("transaction_hash"),
      col("transaction.signer_id").as("signer_id"),
      col("tx_block_height"),
      col("tx_block_hash"),
      col("tx_block_timestamp"),
      transactionJson.as("transaction"),
      col("last_block_height"))

  def accountTxs(txs: Dataset[CompletedTx]): DataFrame = {
    val accounts = array_distinct(concat(
      array(col("transaction.signer_id")),
      flatten(transform(col("receipts"),
        r => accountsFromReceipt(r.getField("receipt")))),
      flatten(transform(col("receipts"),
        r => accountsFromLogs(
          r.getField("execution_outcome").getField("outcome").getField("logs"))))))
    txs.toDF()
      .select(
        explode(accounts).as("account_id"),
        col("transaction.hash").as("transaction_hash"),
        col("transaction.signer_id").as("signer_id"),
        col("tx_block_height"),
        col("tx_block_timestamp"))
  }

  def blockTxs(txs: Dataset[CompletedTx]): DataFrame =
    txs.toDF()
      .select(
        explode(col("blocks")).as("b"),
        col("transaction.hash").as("transaction_hash"),
        col("transaction.signer_id").as("signer_id"),
        col("tx_block_height"))
      .select(
        col("b.block_height").as("block_height"),
        col("b.block_hash").as("block_hash"),
        col("b.block_timestamp").as("block_timestamp"),
        col("transaction_hash"), col("signer_id"), col("tx_block_height"))

  def receiptTxs(txs: Dataset[CompletedTx]): DataFrame =
    txs.toDF()
      .select(
        explode(concat(
          transform(col("receipts"), r => r.getField("receipt").getField("receipt_id")),
          transform(col("data_receipts"), _.getField("receipt_id"))))
          .as("receipt_id"),
        col("transaction.hash").as("transaction_hash"),
        col("transaction.signer_id").as("signer_id"),
        col("tx_block_height"),
        col("tx_block_timestamp"))

  /** The `blocks` table (README.md:311-332) — stateless header
    * projection straight off the block stream. */
  def blocks(blocksDf: DataFrame): DataFrame =
    blocksDf.select(
      col("block.header.height").as("block_height"),
      col("block.header.hash").as("block_hash"),
      col("block.header.timestamp_nanosec").as("block_timestamp"),
      col("block.header.prev_height").as("prev_block_height"),
      col("block.header.epoch_id").as("epoch_id"),
      col("block.header.chunks_included").as("chunks_included"),
      col("block.header.prev_hash").as("prev_block_hash"),
      col("block.author").as("author_id"),
      col("block.header.signature").as("signature"),
      col("block.header.latest_protocol_version").as("protocol_version"))
}
