-- graft: materialized=table
-- test: not_null lang
-- test: relationships lang raw_docs lang
-- test: row_count_between 1 1000
select lang, loaded_batch, count(*) as n_docs,
       sum(n_chars) as total_chars, sum(text_len) as total_len,
       count(distinct source) as n_sources
from {{ ref('doc_stats') }}
group by lang, loaded_batch
